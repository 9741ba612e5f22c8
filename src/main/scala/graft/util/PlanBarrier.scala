package graft.util

import org.apache.spark.sql.{DataFrame, Encoders}

/** Optimizer fence for expensive derived columns.
  *
  * Catalyst's projection collapsing / filter pushdown will happily inline
  * an expensive expression (tokenize -> shingle -> hash chains) into every
  * consumer — a Generate's inferred IsNotNull filter alone can triplicate
  * it, and once the expression outgrows janino's limits the whole operator
  * drops out of codegen into per-element interpreted eval.
  *
  * `fence` pins such a derivation as a materialized row boundary via an
  * identity `mapPartitions`: a narrow, shuffle-free, streaming-friendly
  * transformation that the optimizer cannot see through, so downstream
  * operators consume plain attributes. Costs one ser/deser per row — at
  * 100 TB that is noise next to evaluating a tokenizer O(tokens) extra
  * times per row.
  */
object PlanBarrier {

  /** Singleton identity function: two `fence` calls over equal inputs
    * produce canonically-equal plans (a fresh lambda per call would make
    * every fence plan unique), so CacheManager can substitute a persisted
    * copy of one pipeline into another query that derives the same data. */
  private val identityFn: Iterator[org.apache.spark.sql.Row] => Iterator[org.apache.spark.sql.Row] =
    it => it

  /** Identity map-partitions barrier preserving the schema. */
  def fence(df: DataFrame): DataFrame =
    df.mapPartitions(identityFn)(Encoders.row(df.schema))
}
