package graft.core

import org.scalatest.funsuite.AnyFunSuite

class CliSpec extends AnyFunSuite {

  test("U5: full flag surface parses with reference spellings") {
    val cfg = Cli.parse(Seq(
      "--year", "2024", "--quarter", "2", "--raw-root", "/data/raw",
      "--curated-root", "/data/cur", "--p1", "0.05", "--p99", "0.95",
      "--sample-frac", "0.1", "--max-rows", "10000",
      "--sin-outliers", "--skip-missing", "--algoritmo", "rf"
    ))
    assert(cfg.year == 2024)
    assert(cfg.resolvedMonths == Seq("04", "05", "06"))
    assert(cfg.p1 == 0.05 && cfg.p99 == 0.95)
    assert(cfg.sampleFrac.contains(0.1) && cfg.maxRows.contains(10000))
    assert(cfg.sinOutliers && cfg.skipMissing && cfg.algoritmo == "rf")
  }

  test("U5: train/score/export/manifest flag surface (scripts 00/04/05/06)") {
    val cfg = Cli.parse(Seq(
      "--year", "2024", "--month", "3",
      "--hdfs-uri", "hdfs://namenode:8020/",
      "--model-root", "/models/m", "--metrics-root", "/reports/m",
      "--predictions-root", "/data/pred", "--marts-root", "/data/marts",
      "--output-dir", "out/export", "--usar-subdir",
      "--exportar-metricas", "--exportar-errores",
      "--base-url", "https://example.test/data", "--manifest-path", "m.json",
      "--force"
    ))
    assert(cfg.hdfsUri == "hdfs://namenode:8020/")
    assert(cfg.uri("/models/m") == "hdfs://namenode:8020/models/m")
    assert(cfg.modelRoot == "/models/m" && cfg.metricsRoot == "/reports/m")
    assert(cfg.predictionsRoot == "/data/pred" && cfg.martsRoot == "/data/marts")
    assert(cfg.outputDir == "out/export" && cfg.usarSubdir)
    assert(cfg.exportarMetricas && cfg.exportarErrores && cfg.force)
    assert(cfg.baseUrl == "https://example.test/data")
    assert(cfg.manifestPath.contains("m.json"))
    // empty hdfs-uri (default) leaves paths untouched (local run)
    assert(Cli.parse(Nil).uri("/data/x") == "/data/x")
  }

  test("U5: month selectors stay mutually exclusive; bad flags and algos rejected") {
    intercept[IllegalArgumentException](
      Cli.parse(Seq("--month", "1", "--quarter", "2")).resolvedMonths)
    intercept[IllegalArgumentException](Cli.parse(Seq("--bogus", "x")))
    intercept[IllegalArgumentException](Cli.parse(Seq("--algoritmo", "xgboost")))
    assert(Cli.parse(Seq("--months", "1,2,11")).resolvedMonths == Seq("01", "02", "11"))
  }

  test("U6: EtlMain skip-missing runs the loop without failing on absent months") {
    val spark = graft.TestSpark.spark
    val cfg = Cli.parse(Seq(
      "--months", "1,2", "--raw-root", "/tmp/definitely-missing-root",
      "--curated-root", java.nio.file.Files.createTempDirectory("cli-etl").toString,
      "--skip-missing"
    ))
    graft.jobs.EtlMain.run(spark, cfg) // must not throw
    // without --skip-missing the same loop must fail
    intercept[IllegalStateException] {
      graft.jobs.EtlMain.run(spark, cfg.copy(skipMissing = false))
    }
  }
}
