package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the two techniques that matter at 100 TB:
  * salted two-phase aggregation (a hot group key overwhelms one reducer) and
  * salted broadcast join (a hot join key overwhelms one task; for
  * shuffle joins AQE's skewedJoin handles it, but broadcast-side replication
  * is the plan-stable variant when the dim side is small).
  */
object Skew {

  /** Two-phase aggregation: first aggregate on (key, salt) — spreading a hot
    * key over `salts` reducers — then merge the partials per key. `aggs`
    * must be algebraic (re-aggregatable): here count and sum, the building
    * blocks of avg and friends.
    *
    * At 100 TB a single hot key (null ids, default values, bot users) easily
    * holds >1% of rows; without salting that reducer runs 100× longer than
    * the median and the stage straggles.
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     salts: Int = 16): DataFrame = {
    // salt derived from the DATA (every input column), not
    // monotonically_increasing_id(): a retried/repartitioned task re-salts
    // identically, so partial aggregates are retry-stable for free. Only
    // fully-identical rows share a salt — they spread no worse than the
    // row-id salt did in expectation.
    val salt = pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*),
      lit(salts.toLong)).cast("int")
    df.select(key.as("key"), value.as("v"), salt.as("__salt"))
      .groupBy(col("key"), col("__salt"))
      .agg(sum(col("v")).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col("key"))
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n"))
  }

  /** Salted broadcast-replication join for a skewed fact side: replicate
    * each (small) dim row `salts` times with a salt column; tag each fact
    * row with a random salt in [0, salts); equi-join on (key, salt). Every
    * hot fact key now spreads over `salts` tasks. Dim side must be
    * broadcast-sized (it grows by `salts`×).
    */
  def saltedBroadcastJoin(fact: DataFrame, dim: DataFrame, key: String,
                          salts: Int = 16): DataFrame = {
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    // data-derived salt (see saltedSumCount): retry-stable, so a re-executed
    // fact partition re-joins against the same replicated dim rows
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*),
        lit(salts.toLong)).cast("int"))
    saltedFact.join(broadcast(saltedDim), Seq(key, "__salt")).drop("__salt")
  }
}
