package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Proves the skew-salting scale pattern (PERF.md "skewed keys →
  * salting"): a fact table whose key distribution has one hot key joins a
  * dim table by exploding the dim side into S salt replicas and keying
  * the fact side with a deterministic salt, so the hot key's rows spread
  * over S reducer partitions instead of one straggler task.
  *
  * The spec pins the two properties that make the pattern safe to deploy:
  *  1. result equivalence — the salted join returns exactly the rows of
  *     the plain join (salting is a pure physical rewrite);
  *  2. spread — the hot key's rows land in S distinct (key, salt) groups
  *     of ~hot/S rows each, i.e. the straggler is actually dissolved.
  *
  * At 100 TB the same rewrite applies verbatim (salt count scales with
  * the observed skew ratio); AQE's skew-join split automates it for sort-
  * merge joins, but salting remains the portable form that also covers
  * aggregations (salt → partial agg → de-salt final agg).
  */
class SkewSaltSpec extends AnyFunSuite {
  import TestSpark._

  private val S = 8 // salt fan-out

  test("salted join equals plain join and dissolves the hot key") {
    import spark.implicits._
    // fact: one hot key (0) with 20k rows, 1000 cold keys with 5 each
    val hot = spark.range(20000).select(lit(0L).as("k"), col("id").as("row_id"))
    val cold = spark.range(5000).select((col("id") % 1000 + 1).as("k"),
      (col("id") + 100000).as("row_id"))
    val fact = hot.union(cold)
    val dim = spark.range(1001).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("payload"))

    val plain = fact.join(dim, "k").select("row_id", "payload")

    // salted: fact gets a deterministic salt from its row identity; dim
    // explodes to all S salts so every (k, salt) bucket can still match.
    val saltedFact = fact.withColumn("salt", pmod(col("row_id"), lit(S)))
    val saltedDim = dim.withColumn("salt", explode(sequence(lit(0), lit(S - 1))))
    val salted = saltedFact.join(saltedDim, Seq("k", "salt"))
      .select("row_id", "payload")

    // 1. pure rewrite: identical result set
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    // 2. spread: the hot key now occupies S groups of ~20000/S rows
    val spread = saltedFact.filter(col("k") === 0)
      .groupBy("salt").count().collect().map(_.getLong(1))
    assert(spread.length === S)
    val (mn, mx) = (spread.min, spread.max)
    assert(mx - mn <= 1, s"salt groups unbalanced: min=$mn max=$mx")
    assert(mx <= 20000 / S + 1)
  }

  test("salted aggregation: partial per (key, salt), exact final merge") {
    // the agg form of the same pattern: sum per (k, salt) first (spreads
    // the hot key's combine work), then merge salts — bit-exact for
    // integer sums, and the shape AQE cannot rewrite for you.
    val fact = spark.range(20000)
      .select((when(col("id") < 16000, 0L).otherwise(col("id") % 100 + 1)).as("k"),
        (col("id") % 7).as("v"))
    val direct = fact.groupBy("k").agg(sum("v").as("s"))
    val salted = fact.withColumn("salt", pmod(col("v") + col("k"), lit(S)))
      .groupBy("k", "salt").agg(sum("v").as("ps"))
      .groupBy("k").agg(sum("ps").as("s"))
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true)") {
    // The automated counterpart of the manual salt: AQE's
    // OptimizeSkewedJoin must detect the oversized shuffle partition and
    // split it into parallel subtasks. Own session so the thresholds
    // (tuned down to fire on test-sized data) never leak to other specs.
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    // ~90% of fact rows share key 0; md5 payload defeats shuffle
    // compression so the hot partition's byte size reflects its rows
    val fact = s.range(400000).select(
      when(col("id") % 10 < 9, lit(0L)).otherwise(col("id") % 1000).as("k"),
      md5(col("id").cast("string").cast("binary")).as("payload"))
    val dim = s.range(1000).select(col("id").as("k"),
      md5((col("id") + 7).cast("string").cast("binary")).as("dpay"))
    val j = fact.join(dim, "k")
    // execute THIS frame's queryExecution (a count() would plan its own
    // query and leave j's adaptive plan unfinalized)
    assert(j.toLocalIterator().asScala.length === 400000)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"expected AQE skew-join split (skew=true) in the final plan:\n$plan")
  }
}
