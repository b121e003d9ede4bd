package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.etl.Features
import graft.marts.Marts
import graft.ml.Pipelines
import graft.ml.Pipelines.RegressionConfig

/** ML pipeline queries (SURVEY.md §2.9 M1-M9). Training is not
  * SQL-expressible, so these carry no DuckDB oracle — the driver records a
  * rows-only check. Determinism choices for stable row counts:
  * a key-mod train/test split (instead of partition-layout-dependent
  * `randomSplit`) and fixed seeds everywhere.
  *
  * The reference trains `trip_duration_min` from temporal + categorical
  * features (`scripts/04_train_sparkml.py:93-99`); the synthetic analog
  * trains `value` from (event_hour, event_dow, is_weekend; event_type).
  * Training frames are capped like the reference's `--max-rows` (300k)
  * so fit time stays bounded at any scale factor; scoring runs on the full
  * frame (transform is embarrassingly parallel).
  */
object MlQueries {

  private def prepared(s: SparkSession, dir: String): DataFrame =
    Features.withTemporal(Tables.events(s, dir), "ts", "event")
      .select(
        col("event_id"), col("value"),
        col("event_hour").cast("double").as("event_hour"),
        col("event_dow").cast("double").as("event_dow"),
        col("is_weekend").cast("double").as("is_weekend"),
        col("event_type")
      )

  private val cfgBase = RegressionConfig(
    label = "value",
    numericCols = Seq("event_hour", "event_dow", "is_weekend"),
    categoricalCols = Seq("event_type")
  )

  /** Deterministic 80/20 key-mod split (O5 analog; see scaladoc). */
  private def split(df: DataFrame): (DataFrame, DataFrame) =
    (df.filter(pmod(col("event_id"), lit(10)) < 8),
     df.filter(pmod(col("event_id"), lit(10)) >= 8))

  private def trainScore(s: SparkSession, dir: String, cfg: RegressionConfig): DataFrame = {
    val df = prepared(s, dir)
    val (train, test) = split(df)
    val capped = train.limit(300000).cache()
    capped.count() // materialize: every fit iteration must read memory, not parquet
    val model = Pipelines.regression(capped, cfg).fit(capped)
    capped.unpersist(blocking = false)
    model.transform(test)
  }

  /** M4+M7: GBT train + score, summarized as the A9 error mart over the
    * held-out split (pred vs label per hour). */
  private def gbtScore(s: SparkSession, dir: String): DataFrame =
    Marts.errorsByHour(
      trainScore(s, dir, cfgBase.copy(maxIter = 10)),
      "event_hour", "prediction", "value"
    ).select(
      col("event_hour").cast("long").as("event_hour"),
      col("total_viajes"),
      round(col("mae"), 2).as("mae"),
      round(col("rmse"), 2).as("rmse")
    ).orderBy(col("event_hour"))

  /** M5+M7: RandomForest variant (reference `--algoritmo rf`). */
  private def rfScore(s: SparkSession, dir: String): DataFrame =
    Marts.errorsByHour(
      trainScore(s, dir, cfgBase.copy(algo = "rf", numTrees = 20, rfMaxDepth = 8)),
      "event_hour", "prediction", "value"
    ).select(
      col("event_hour").cast("long").as("event_hour"),
      col("total_viajes"),
      round(col("mae"), 2).as("mae"),
      round(col("rmse"), 2).as("rmse")
    ).orderBy(col("event_hour"))

  /** M8 + the reference's single-row metrics record
    * (`scripts/04_train_sparkml.py:132-151`): rmse/mae/r2 + split counts as
    * one row (mixed string/double/long fields). */
  private def metricsRecord(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val df = prepared(s, dir)
    val (train, test) = split(df)
    val capped = train.limit(300000).cache()
    val nTrain = capped.count() // materialize before fit
    val model = Pipelines.regression(capped, cfgBase.copy(maxIter = 5)).fit(capped)
    val m = Pipelines.evaluate(model.transform(test), "value")
    capped.unpersist(blocking = false)
    Seq((
      "gbt", math.round(m.rmse * 100) / 100.0, math.round(m.mae * 100) / 100.0,
      math.round(m.r2 * 10000) / 10000.0, nTrain, test.count()
    )).toDF("algoritmo", "rmse", "mae", "r2", "filas_entrenamiento", "filas_prueba")
  }

  val all: Seq[QuerySpec] = Seq(
    QuerySpec("ml_gbt_score", gbtScore, None),
    QuerySpec("ml_rf_score", rfScore, None),
    QuerySpec("ml_metrics_record", metricsRecord, None)
  )
}
