package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot change-data-capture: classify every key across two table
  * snapshots as insert / delete / update / unchanged — the
  * change-capture primitive behind the reference's merged-database
  * append workflow (SSURGO_MergeDatabases*.py's append+dedup is the
  * insert-only special case) and the first stage of any SCD/lakehouse
  * merge.
  *
  * Plan: ONE full-outer join on the key — both snapshots shuffle once
  * on the same key (no broadcast assumption: at 100 TB both sides are
  * corpus-sized); classification is per-row arithmetic on the joined
  * row. With both snapshots bucketed on the key ([[Lake.writeBucketed]])
  * the shuffle disappears entirely. */
object Cdc {

  /** Diff two snapshots on `key`; `tracked` are the value columns
    * change is detected on (null-safe `<=>` comparison, so a value
    * moving to/from NULL is an update, not a tie). Keys must be unique
    * per snapshot (snapshot semantics). Returns
    * (key, op, old_<c>…, new_<c>…) with op ∈
    * insert | delete | update | unchanged. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
      tracked: Seq[String]): DataFrame = {
    require(tracked.nonEmpty, "snapshotDiff: no tracked columns")
    val o = oldSnap.select(col(key).as("_ok") +:
      tracked.map(c => col(c).as(s"old_$c")): _*)
    val n = newSnap.select(col(key).as("_nk") +:
      tracked.map(c => col(c).as(s"new_$c")): _*)
    val changed = tracked.map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    o.join(n, col("_ok") === col("_nk"), "full_outer")
      .withColumn("op",
        when(col("_ok").isNull, lit("insert"))
          .when(col("_nk").isNull, lit("delete"))
          .when(changed, lit("update"))
          .otherwise(lit("unchanged")))
      .withColumn(key, coalesce(col("_ok"), col("_nk")))
      .drop("_ok", "_nk")
  }

  /** [[snapshotDiff]] restricted to actual changes — the rows a
    * downstream merge applies. */
  def changes(oldSnap: DataFrame, newSnap: DataFrame, key: String,
      tracked: Seq[String]): DataFrame =
    snapshotDiff(oldSnap, newSnap, key, tracked)
      .filter(col("op") =!= "unchanged")

  /** Apply a [[changes]] set back onto a snapshot — the MERGE/upsert
    * step that closes the CDC loop (Delta MERGE INTO / Iceberg
    * copy-on-write semantics): deleted keys drop, updated and inserted
    * keys take the change set's new values, untouched rows pass
    * through. applyChanges(old, changes(old, new)) == new — the
    * round-trip identity the s15 gate pins; applying the same change
    * set twice is a no-op (upsert idempotence).
    *
    * Plan: one left-anti join carves the untouched rows (both sides
    * shuffle once on the key — no broadcast assumption at snapshot
    * scale; bucketed layouts remove the exchange), then a union with
    * the change rows' new values. Nothing rewrites rows outside the
    * touched key set — the partition-overwrite frugality st04 applies
    * at the file level, here at row granularity.
    *
    * `tracked` must enumerate EVERY non-key column of the snapshot
    * (loud require): a change row carries only the tracked values, so
    * an untracked column would be unfillable on inserted keys. */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, key: String,
      tracked: Seq[String]): DataFrame = {
    require(snapshot.columns.toSet == (key +: tracked).toSet,
      s"applyChanges: tracked must cover every non-key snapshot column — " +
        s"snapshot has ${snapshot.columns.mkString(", ")}, " +
        s"key+tracked covers ${(key +: tracked).mkString(", ")}")
    val touched = changes.select(col(key))
    val survivors = snapshot.join(touched, Seq(key), "left_anti")
    val upserts = changes.filter(col("op") =!= "delete")
      .select(col(key) +: tracked.map(c => col(s"new_$c").as(c)): _*)
    survivors.unionByName(upserts)
  }
}
