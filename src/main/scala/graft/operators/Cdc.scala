package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog application (CDC merge / SCD-type-1 upsert): fold a stream of
  * keyed upsert/delete records onto a snapshot, producing the new snapshot.
  * This is the lake-maintenance shape of the reference's incremental pull —
  * the reference appends every page to a TSV and never reconciles
  * (`ElasticSearch ETL.py:247-257`); a 100 TB corpus instead maintains a
  * compacted current-state table and applies deltas.
  *
  * Scale design: the changelog compacts FIRST (one shuffle of the delta,
  * max_by per key — deltas are typically ≪ snapshot), then the snapshot is
  * touched by exactly one join. With AQE the compacted-delta side
  * broadcasts when small, so the snapshot is scanned once and NEVER
  * shuffled; the output preserves the snapshot's column order so repeated
  * application is schema-stable.
  */
object Cdc {

  /** Apply `changes` to `snapshot`.
    *
    * @param keyCol   join key, present in both inputs
    * @param seqCols  total order WITHIN a key (later wins); must be
    *                 duplicate-free per key for determinism — pass a
    *                 tiebreaker (e.g. ts, change_id) like any CDC log
    * @param opCol    string column in `changes`: `deleteOp` deletes the
    *                 key; anything else upserts the change row's payload
    *                 (all non-key/op/seq columns must match snapshot names)
    */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame,
      keyCol: String, seqCols: Seq[String], opCol: String,
      deleteOp: String = "delete"): DataFrame = {
    require(seqCols.nonEmpty, "seqCols must order changes within a key")
    val payload = snapshot.columns.filterNot(_ == keyCol)
    // compact: latest change per key, ONE wide shuffle of the (small)
    // delta side; max_by on the packed struct avoids a window sort
    val seq = struct(seqCols.map(col): _*)
    val packed = struct((opCol +: payload).map(col): _*)
    val latest = changes
      .groupBy(col(keyCol))
      .agg(max_by(packed, seq).as("ch"))
      .select(col(keyCol) +: col(s"ch.$opCol").as(opCol) +:
        payload.map(c => col(s"ch.$c").as(c)): _*)
    // one pass over the snapshot: drop keys the compacted delta touches
    // (upserts replace, deletes remove), then add the surviving upserts
    val upserts = latest.filter(col(opCol) =!= deleteOp)
      .select(keyCol, payload: _*)
    snapshot.join(latest.select(keyCol), Seq(keyCol), "left_anti")
      .unionByName(upserts)
  }

  /** Out-of-order-safe VERSIONED merge — the cross-batch form of
    * [[applyChangelog]] for incremental application (streaming
    * `foreachBatch`) where batch boundaries are arbitrary: state and
    * delta BOTH carry (`seqCols`, `opCol`), per key the max-seq row
    * wins no matter which side (or which batch) it arrived in, and
    * delete TOMBSTONES are retained in the output so a stale upsert in
    * a later batch cannot resurrect a deleted key. Readers filter
    * `opCol != deleteOp`. Replay-idempotent (re-merging an applied
    * batch is a no-op), so it composes with at-least-once delivery.
    *
    * One max_by shuffle per merge, no window sort; with AQE the
    * (small) delta broadcasts nowhere — both sides group on the key —
    * but partial aggregation keeps the map-side combine, and at 100 TB
    * the state side would be bucketed on the key so successive merges
    * reuse the partitioning.
    */
  def mergeVersioned(state: DataFrame, delta: DataFrame, keyCol: String,
      seqCols: Seq[String], opCol: String): DataFrame = {
    require(seqCols.nonEmpty, "seqCols must order changes within a key")
    require(state.columns.sorted.sameElements(delta.columns.sorted),
      s"state/delta schemas differ: ${state.columns.mkString(",")} vs " +
        delta.columns.mkString(","))
    val payload = state.columns.filterNot(_ == keyCol)
    val seq = struct(seqCols.map(col): _*)
    val packed = struct(payload.map(col): _*)
    state.unionByName(delta)
      .groupBy(col(keyCol))
      .agg(max_by(packed, seq).as("w"))
      .select(col(keyCol) +: payload.map(c => col(s"w.$c").as(c)): _*)
  }
}
