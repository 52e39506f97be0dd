package graft

import org.apache.spark.sql.functions._
import graft.engine.{Skew, Tables}

class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  test("saltedJoin returns the same rows as a plain equi-join on skewed data") {
    // heavy skew: 90% of rows share one key
    val large = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i.toLong))
      .toDF("k", "row_id")
    val small = Seq((1L, "hot"), (950L, "cold"), (999L, "cold2")).toDF("k", "v")
    val plain = large.join(small, Seq("k"))
      .orderBy("row_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val salted = Skew.saltedJoin(large, small, "k", "row_id", salts = 8)
      .orderBy("row_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(salted == plain)
    assert(salted.count(_._3 == "hot") == 900)
  }

  test("saltedJoin spreads the hot key across salt partitions") {
    val large = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "row_id")
    // exercise the library's own salt derivation, not a copy of the formula
    val salts = large.withColumn("__salt", Skew.salt(col("row_id"), 8))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(salts.length == 8, "hot key not spread across all 8 salts")
    assert(salts.max < 1000 * 0.3, s"salt distribution too skewed: ${salts.toSeq}")
  }

  test("saltedCountDistinct equals plain countDistinct on fixture data") {
    val o = Tables.orders(spark, sf0001)
    val plain = o.groupBy("o_orderstatus")
      .agg(countDistinct("o_custkey").as("n"))
      .orderBy("o_orderstatus").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val salted = Skew.saltedCountDistinct(o, "o_orderstatus", "o_custkey", salts = 8)
      .orderBy("o_orderstatus").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(salted == plain)
  }
}
