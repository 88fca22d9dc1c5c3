package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware equi-join: the hot-key JOIN guard, completing the skew
  * toolkit beside [[Salting.saltedSumCount]] (aggregate skew), the
  * as-of bucketing (hot-key lookups) and the banded-LSH caps (hot
  * buckets).
  *
  * A plain shuffle join lands every row of a hot key on ONE reducer:
  * at 100 TB a power-law key (the null-ish sentinel, the default
  * country, the bot user) turns one task into the job's wall clock.
  * The classic rewrite splits the fact side on an exact hot-key
  * census: COLD keys take the normal shuffle join; HOT keys join a
  * `buckets`-way replicated copy of their dim slice on `(key, salt)`,
  * so the hot mass spreads over `buckets` reducers. The union is
  * EXACTLY the plain join — salting only re-routes rows — which is
  * what the q180 oracle states as a plain SQL join.
  *
  * Scale posture: the census is one map-side-combined count on the
  * join key (partials absorb the skew); the hot-key set is at most
  * |fact| / hotThreshold rows — broadcast by construction; the dim's
  * hot slice is replicated `buckets`×, bounded by |hot keys| ×
  * buckets × (dim rows per key). When that slice fits in a broadcast
  * (the common case — few hot keys), prefer a plain broadcast join
  * of the hot partition; this operator is the general machinery for
  * when it does not. AQE's skew-join handles SORT-merge skew
  * post-hoc from runtime stats; this rewrite is the declarative,
  * deterministic form that also covers hash joins and replays
  * identically in an oracle.
  */
object SkewJoin {

  /** Exact equi-join of `fact` to `dim` on `key`, hot keys salted
    * `buckets` ways. `saltOf` must be a deterministic row expression
    * over `fact` columns (hash a unique id) so re-runs route rows
    * identically; it only balances load, never changes the result.
    * Output columns: `key`, then fact payload, then dim payload —
    * the same surface a plain `fact.join(dim, Seq(key))` yields. */
  def skewEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
      hotThreshold: Long, buckets: Int, saltOf: Column): DataFrame = {
    require(hotThreshold >= 1, "hotThreshold must be positive")
    require(buckets >= 1, "buckets must be positive")
    val hot = fact.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= hotThreshold)
      .select(col(key), lit(1).as("__hot"))
    val tagged = fact.join(broadcast(hot), Seq(key), "left")
    val cold = tagged.filter(col("__hot").isNull).drop("__hot")
      .join(dim, Seq(key))
    val hotFact = tagged.filter(col("__hot") === 1).drop("__hot")
      .withColumn("__salt", pmod(saltOf.cast("long"), lit(buckets.toLong)))
    val hotDim = dim.join(broadcast(hot.select(key)), Seq(key), "left_semi")
      .withColumn("__salt",
        explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    val hotJoined = hotFact.join(hotDim, Seq(key, "__salt")).drop("__salt")
    cold.unionByName(hotJoined)
  }
}
