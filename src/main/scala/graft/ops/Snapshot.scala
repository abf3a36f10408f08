package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC-style snapshot maintenance for a versioned corpus: apply a change
  * batch (upserts + tombstones) to a base snapshot — the daily-crawl
  * refresh ("new crawl of the same URLs supersedes yesterday's text,
  * takedowns delete") that every living training corpus needs.
  *
  * Shape: ONE unionByName + ONE aggregate. Latest-version-wins is
  * `max(struct(version, change_rank, payload...))` — an argmax the same
  * way as [[VectorOps.assignCells]], so map-side partial aggregation
  * leaves at most one row per key per mapper and the shuffle carries keys,
  * not history (struct max is not hash-aggregable, so it plans as a
  * partially-aggregated SortAggregate — the sort is per-partition and the
  * k-per-key history it sorts is short). The join-based MERGE formulation
  * shuffles BOTH sides and
  * then needs a second pass for the not-matched rows; the window
  * formulation (`row_number over (partition by key order by version)`)
  * sorts every key's full history on one task. Both are strictly worse at
  * corpus scale.
  *
  * Determinism: ties on `version` between base and changes go to the
  * CHANGES row (rank 1 beats rank 0 inside the struct comparison); ties
  * WITHIN the change batch are the caller's bug — one row per (key,
  * version) is the CDC contract.
  */
object Snapshot {

  /** Apply `changes` to `base`. Both must share (keyCol, versionCol,
    * payload...) columns; `changes` additionally carries boolean
    * `deleteCol` tombstones. Returns the new snapshot with base's schema:
    * highest version per key, tombstoned keys dropped.
    */
  def upsert(base: DataFrame, changes: DataFrame, keyCol: String,
      versionCol: String, deleteCol: String = "deleted"): DataFrame = {
    val payload = base.columns.toSeq
      .filterNot(c => c == keyCol || c == versionCol)
    require(payload.nonEmpty, "snapshot needs at least one payload column")
    require(changes.columns.contains(deleteCol),
      s"changes must carry a boolean '$deleteCol' tombstone column")
    // a base payload column named like the tombstone would be silently
    // overwritten to false below AND duplicated inside the winner struct —
    // corruption, so fail loudly and let the caller rename one side
    require(!base.columns.contains(deleteCol),
      s"base snapshot already has a column named '$deleteCol' — it would " +
        "collide with the tombstone marker; pass a different deleteCol or " +
        "rename the payload column")
    val all = base
      .withColumn(deleteCol, lit(false)).withColumn("_chg", lit(0))
      .unionByName(changes.withColumn("_chg", lit(1)))
    // version first, change-rank second: payload fields after them can
    // only decide a (key, version, rank) tie, which the contract forbids
    val winner = struct(
      Seq(col(versionCol), col("_chg"), col(deleteCol)) ++
        payload.map(col): _*)
    all.groupBy(keyCol)
      .agg(max(winner).as("w"))
      .where(!col(s"w.$deleteCol"))
      .select(col(keyCol) +:
        col(s"w.$versionCol").as(versionCol) +:
        payload.map(c => col(s"w.$c").as(c)): _*)
  }

  /** Corpus version diff — the release-note op between two snapshots:
    * classify every key as added / removed / changed / unchanged by
    * content fingerprint. Same ONE-union-ONE-aggregate shape as
    * [[upsert]] (no outer join: a full outer join shuffles both sides
    * AND plans null-handling for every payload column; the union
    * aggregates the same shuffle volume with map-side partials).
    * Returns (keyCol, status, fp_old, fp_new). Keys must be unique per
    * side (snapshot contract).
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String,
      fpCol: String): DataFrame = {
    def side(df: DataFrame, tag: Int): DataFrame =
      df.select(col(keyCol), col(fpCol).as("__fp"), lit(tag).as("__side"))
    side(oldSnap, 1).unionByName(side(newSnap, 2))
      .groupBy(keyCol)
      .agg(
        max(when(col("__side") === 1, col("__fp"))).as("fp_old"),
        max(when(col("__side") === 2, col("__fp"))).as("fp_new"))
      .withColumn("status",
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") === col("fp_new"), "unchanged")
          .otherwise("changed"))
      .select(col(keyCol), col("status"), col("fp_old"), col("fp_new"))
  }

  /** SCD type-2 history build: fold a CDC change log (keyCol, versionCol,
    * attrCols…, optional boolean tombstones) into the standard
    * point-in-time dimension table — one row per ATTRIBUTE RUN with
    * `(valid_from, valid_to, is_current)`:
    *
    *   - consecutive versions with unchanged attributes COLLAPSE into one
    *     row (null-safe struct compare — a null attribute is a value, not
    *     a wildcard);
    *   - a tombstone CLOSES the open run without opening one (the key has
    *     no current row until a later re-insert starts a fresh run);
    *   - `valid_to` is the next run boundary's version, NULL while open;
    *     `is_current` marks open, non-deleted runs.
    *
    * Scale shape: two windows, both PARTITIONED BY KEY over the same
    * (key, version) ordering — one exchange, per-key histories are short
    * by the CDC contract (one row per (key, version) — same contract as
    * [[upsert]]), so no task ever sorts more than one key's history. The
    * second window runs over the boundary rows only (post-filter), which
    * is strictly smaller. No self-join, nothing global.
    */
  def scd2History(changes: DataFrame, keyCol: String, versionCol: String,
      attrCols: Seq[String], deleteCol: Option[String] = None): DataFrame = {
    require(attrCols.nonEmpty, "scd2History needs at least one attribute")
    val w = Window.partitionBy(keyCol).orderBy(versionCol)
    val del = deleteCol.map(col).getOrElse(lit(false))
    val attrs = struct(attrCols.map(col): _*)
    // a run OPENS at: the key's first version, any version after a
    // tombstone, or an attribute change; tombstones are boundaries too
    // (they must terminate the previous run's valid_to)
    val boundary = del ||
      lag(attrs, 1).over(w).isNull ||
      coalesce(lag(del, 1).over(w), lit(false)) ||
      !(attrs <=> lag(attrs, 1).over(w))
    changes
      .withColumn("__del", del)
      .withColumn("__b", boundary)
      .where(col("__b"))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .where(!col("__del"))
      .select(col(keyCol) +:
        col(versionCol).as("valid_from") +:
        col("valid_to") +:
        (col("valid_to").isNull).as("is_current") +:
        attrCols.map(col): _*)
  }
}
