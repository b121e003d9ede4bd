package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-feed (CDC) for the MERGE/DELETE operators: given a target
  * snapshot and a merge source (or a delete keyset), emit the row-level
  * change set — `_op` in {insert, update_preimage, update_postimage,
  * delete} — that downstream incremental consumers replay instead of
  * re-reading the table.
  *
  * At 100 TB the change feed IS the integration contract: a daily merge
  * touching 0.1% of rows produces a feed 1000x smaller than the table, and
  * every consumer (mart refresh, replication, cache invalidation, audit)
  * reads the feed, not the snapshot. `applyChangeFeed` is the replay
  * operator — ChangeFeedSpec proves snapshot + feed == post-merge table,
  * and the `merge_changefeed` oracle hash-checks the feed content itself
  * against a relational recomputation.
  *
  * Shapes: every leg is a key equi-join (semi/anti) between source and
  * target — broadcast when the batch is small, shuffle otherwise; nothing
  * quadratic. The pre-image leg is the only one that must READ matched
  * target rows (consumers that don't need pre-images can skip it and the
  * target scan collapses to the semi-join probe).
  */
object ChangeFeed {

  val opCol = "_op"

  /** The change feed a MERGE of `source` into `target` by `keyCols`
    * produces (whole-row update semantics, duplicate source keys
    * pre-collapsed as in Merge). Columns: target schema + `_op`. */
  def mergeFeed(target: DataFrame, source: DataFrame, keyCols: Seq[String]): DataFrame = {
    val src = source.dropDuplicates(keyCols)
      .select(target.columns.map(col): _*)
    val srcKeys = src.select(keyCols.map(col): _*)
    val inserts = src.join(target.select(keyCols.map(col): _*), keyCols, "left_anti")
      .withColumn(opCol, lit("insert"))
    val updatesPost = src.join(target.select(keyCols.map(col): _*), keyCols, "left_semi")
      .withColumn(opCol, lit("update_postimage"))
    val updatesPre = target.join(srcKeys, keyCols, "left_semi")
      .withColumn(opCol, lit("update_preimage"))
    inserts.unionByName(updatesPost).unionByName(updatesPre)
  }

  /** The change feed a key-delete produces: the doomed rows, `_op=delete`. */
  def deleteFeed(target: DataFrame, keys: DataFrame, keyCols: Seq[String]): DataFrame =
    target.join(keys.select(keyCols.map(col): _*).dropDuplicates(keyCols),
        keyCols, "left_semi")
      .withColumn(opCol, lit("delete"))

  /** Replay a feed onto a snapshot: drop keys with update_preimage/delete
    * ops, add insert/update_postimage rows. Inverse-checked by
    * ChangeFeedSpec against the actual Merge/Lifecycle output. */
  def applyChangeFeed(snapshot: DataFrame, feed: DataFrame, keyCols: Seq[String]): DataFrame = {
    val dropKeys = feed.where(col(opCol).isin("update_preimage", "delete"))
      .select(keyCols.map(col): _*).dropDuplicates(keyCols)
    val adds = feed.where(col(opCol).isin("insert", "update_postimage"))
      .drop(opCol)
    snapshot.join(dropKeys, keyCols, "left_anti")
      .unionByName(adds.select(snapshot.columns.map(col): _*))
  }
}
