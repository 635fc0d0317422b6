package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md §7 edge-case fixture: nulls in filter/join/group/agg/sort
  * positions, empty inputs, duplicate join keys, zero-common-column
  * "natural" joins, cross-join growth — documenting the semantic choices
  * (SQL 3VL, SURVEY §7 M0) with executable evidence.
  */
class NullEdgeCasesSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val users = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("age", LongType), StructField("email", StringType)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "alice", 34L, "a@x.io"), Row(2L, "bob", null, null),
        Row(3L, "carol", 41L, "c@x.io"), Row(4L, null, 28L, null)),
      schema)
  }

  private lazy val posts = {
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("title", StringType)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "p1"), Row(1L, "p2"), Row(null, "orphan"), Row(9L, "dangling")),
      schema)
  }

  test("3VL: null comparisons drop rows in filters, in both polarities") {
    // reference treats null compares as false (SURVEY §2.3); SQL 3VL agrees
    // for the positive filter but ALSO excludes nulls from the negation —
    // the documented delta is only observable via IS NULL.
    assert(users.filter(col("age") > 30).count() == 2)
    assert(users.filter(!(col("age") > 30)).count() == 1)
    assert(users.filter(col("age") > 30 || col("age").isNull).count() == 3)
  }

  test("null join keys never match, even against other nulls") {
    val joined = users.join(posts, col("id") === col("user_id"))
    assert(joined.count() == 2) // only alice's two posts
    val leftJ = users.join(posts, col("id") === col("user_id"), "left")
    assert(leftJ.filter(col("title").isNull).count() == 3) // bob, carol, null-name
  }

  test("duplicate join keys fan out") {
    assert(users.join(posts, col("id") === col("user_id")).filter(col("name") === "alice").count() == 2)
  }

  test("nulls form their own group and sort to the chosen end") {
    val grouped = users.groupBy("age").count()
    assert(grouped.filter(col("age").isNull).count() == 1)
    val sorted = users.orderBy(col("age").asc_nulls_last).collect()
    assert(sorted.last.isNullAt(2))
    val sortedFirst = users.orderBy(col("age").asc_nulls_first).collect()
    assert(sortedFirst.head.isNullAt(2))
  }

  test("aggregates skip nulls; COUNT(col) vs COUNT(*)") {
    val r = users.agg(count(lit(1)).as("all"), count(col("age")).as("ages"),
      avg("age").as("avg_age")).collect()(0)
    assert(r.getLong(0) == 4 && r.getLong(1) == 3)
    assert(math.abs(r.getDouble(2) - (34 + 41 + 28) / 3.0) < 1e-9)
    // aggregate over zero rows: COUNT = 0, AVG = null (reference: AVG of none → NULL)
    val empty = users.filter(col("age") > 1000).agg(count(lit(1)), avg("age")).collect()(0)
    assert(empty.getLong(0) == 0 && empty.isNullAt(1))
  }

  test("zero-common-column using-join vs reference cross fallback") {
    // reference NATURAL JOIN degenerates to CROSS when no common columns
    // (relational_engine/src/lib.rs:4358-4360); Spark's join(usingCols=Nil)
    // is equivalent to crossJoin — we expose that choice explicitly.
    val cross = users.crossJoin(posts)
    assert(cross.count() == users.count() * posts.count())
  }

  test("empty inputs propagate without error") {
    val none = users.filter(lit(false))
    assert(none.join(posts, col("id") === col("user_id")).count() == 0)
    assert(none.groupBy("age").count().count() == 0)
    assert(none.orderBy("age").limit(5).count() == 0)
  }
}
