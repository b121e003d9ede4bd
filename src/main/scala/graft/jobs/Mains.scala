package graft.jobs

import org.apache.spark.sql.SparkSession

import graft.core.{Cli, Months, Sessions, Tables}

/** U6: runnable job entry points with the reference's per-month loop +
  * skip-missing semantics (`/root/reference/scripts/02_spark_etl.py:74-144`).
  * `spark-submit --class graft.jobs.EtlMain ... --year 2024 --quarter 1
  * --raw-root ... --curated-root ... --skip-missing`
  */
object EtlMain {
  def main(args: Array[String]): Unit = {
    val cfg = Cli.parse(args.toIndexedSeq)
    val spark = Sessions.build(cfg.appName, cfg.master, shufflePartitions = 32)
    try run(spark, cfg)
    finally spark.stop()
  }

  def run(spark: SparkSession, cfg: Cli.JobConfig): Unit =
    cfg.resolvedMonths.foreach { mm =>
      val src = Months.partitionPath(cfg.rawRoot, cfg.year, mm)
      Tables.readOptional(spark, src) match {
        case None if cfg.skipMissing => () // warn logged by readOptional
        case None => throw new IllegalStateException(s"input missing: $src")
        case Some(raw0) =>
          val sampled = cfg.sampleFrac.fold(raw0)(f => raw0.sample(withReplacement = false, f, 42L))
          val capped = cfg.maxRows.fold(sampled)(sampled.limit)
          Jobs.etl(spark, capped, cfg.curatedRoot, cfg.year, mm.toInt,
            removeOutliers = !cfg.sinOutliers)
      }
    }
}

object MartsMain {
  def main(args: Array[String]): Unit = {
    val cfg = Cli.parse(args.toIndexedSeq)
    val spark = Sessions.build(cfg.appName, cfg.master, shufflePartitions = 32)
    try run(spark, cfg)
    finally spark.stop()
  }

  def run(spark: SparkSession, cfg: Cli.JobConfig): Unit =
    cfg.resolvedMonths.foreach { mm =>
      val src = Months.partitionPath(cfg.curatedRoot, cfg.year, mm)
      Tables.readOptional(spark, src) match {
        case None if cfg.skipMissing => ()
        case None => throw new IllegalStateException(s"input missing: $src")
        case Some(curated) =>
          Jobs.marts(spark, curated, Months.partitionPath(cfg.outRoot, cfg.year, mm))
      }
    }
}
