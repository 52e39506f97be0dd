package graft

import org.apache.spark.sql.functions._
import graft.sources.Coerce
import graft.sources.Coerce._

/** Per-column coercion/cleaning — the reference's ingest-edge stage:
  * catalog-number normalization, typed casts, and the good/bad audit
  * split.
  */
class CoerceSpec extends SparkSpecBase {
  import spark.implicits._

  private val rawCatalog = Seq(
    ("  math 201.5 ", "3.0", "2019-08-28"),
    ("CSCI 101", "4", "2020-01-15"),
    ("bio 0200.", "not-a-number", "2021-06-01"),   // bad credits
    ("PHYS 2", "2.5", "also-not-a-date"),           // bad date
    (null.asInstanceOf[String], "1.0", "2022-02-02") // null course: NOT bad
  ).toDF("course", "credits", "effective")

  private val rules = Seq(
    Rule("course", Seq(Trim, Upper), "string"),
    Rule("credits", Seq(Trim), "double"),
    Rule("effective", Seq(Trim), "date"))

  test("coerce cleans and casts; nulls pass through") {
    val out = Coerce.coerce(rawCatalog, rules).collect()
    assert(out(0).getString(0) == "MATH 201.5")
    assert(out(1).getDouble(1) == 4.0)
    assert(out(2).isNullAt(1))   // failed cast -> null in the lenient view
    assert(out(4).isNullAt(0))   // genuine null preserved
    assert(Coerce.coerce(rawCatalog, rules).schema("credits").dataType.typeName == "double")
  }

  test("coerceWithAudit splits failing rows and names the offending columns") {
    val (good, bad) = Coerce.coerceWithAudit(rawCatalog, rules)
    assert(good.count() == 3)    // rows 0, 1 and the null-course row
    val badRows = bad.orderBy("course").collect()
    assert(bad.count() == 2)
    val offenders = badRows.map(r =>
      r.getAs[String]("course") -> r.getSeq[String](r.fieldIndex("bad_columns")).toSet).toMap
    assert(offenders("PHYS 2") == Set("effective"))
    assert(offenders("bio 0200.") == Set("credits"))
    // bad keeps ORIGINAL raw values for forensics
    assert(badRows.exists(_.getAs[String]("credits") == "not-a-number"))
    // good side is typed
    assert(good.schema("effective").dataType.typeName == "date")
  }

  test("catalog-number extraction rule (reference's course-number cleaning)") {
    val df = Seq("MATH 201.5", "CSCI  101", "garbage").toDF("raw")
    val out = Coerce.coerce(df,
      Seq(Rule("raw", Seq(Extract("([A-Z]+)\\s+([0-9.]+)", 2)), "string")))
      .collect().map(r => Option(r.getString(0)).getOrElse(""))
    assert(out.toSeq == Seq("201.5", "101", ""))
  }

}
