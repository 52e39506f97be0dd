package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types._
import graft.sources.{Coerce, Rebuild}
import graft.sources.Rebuild.TableSpec

/** End-to-end rebuild orchestration: generation selection → coercion →
  * dependency-ordered build → dedup → FK checks → all-or-nothing snapshot.
  */
class RebuildSpec extends SparkSpecBase {

  private val deptSchema = StructType(Seq(
    StructField("dept_id", IntegerType), StructField("dept_name", StringType)))
  private val courseSchema = StructType(Seq(
    StructField("course_id", IntegerType), StructField("dept_id", IntegerType),
    StructField("credits", DoubleType)))

  private def writeInputs(dir: String, courseRows: Seq[String]): Unit = {
    Files.writeString(Paths.get(s"$dir/DEPTS-20250101.csv"),
      "dept_id,dept_name\n10,math\n20,physics\n")
    Files.writeString(Paths.get(s"$dir/DEPTS-20250301.csv"),
      "dept_id,dept_name\n10, math \n20,physics\n30,biology\n")
    Files.writeString(Paths.get(s"$dir/COURSES-20250301.csv"),
      ("course_id,dept_id,credits" +: courseRows).mkString("", "\n", "\n"))
  }

  private def plan = Seq(
    TableSpec("depts", raw"DEPTS-(\d{8})\.csv", deptSchema,
      rules = Seq(Coerce.Rule("dept_name", Seq(Coerce.Trim, Coerce.Upper), "string")),
      naturalKey = Seq("dept_id")),
    TableSpec("courses", raw"COURSES-(\d{8})\.csv", courseSchema,
      naturalKey = Seq("course_id"),
      foreignKeys = Seq(("dept_id", "depts", "dept_id"))))

  test("clean rebuild: latest generation, coercion, dedup, FK pass, snapshot written") {
    val dir = Files.createTempDirectory("graft_rebuild").toString
    writeInputs(dir, Seq("1,10,3.0", "1,10,3.0", "2,30,4.5", "3,20,oops"))
    val out = s"$dir/out"
    val reports = Rebuild.run(spark, dir, out, plan).map(r => r.table -> r).toMap

    // depts: picked the 20250301 generation (3 rows incl. biology), cleaned
    assert(reports("depts").rowsOut == 3)
    val depts = spark.read.parquet(s"$out/depts").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(depts(10) == "MATH")           // trimmed + uppercased
    assert(depts.contains(30))            // from the newer generation

    // courses: 4 in, 1 bad (credits 'oops'), 1 dup (course 1) -> 2 out
    val c = reports("courses")
    assert(c.rowsIn == 4 && c.badRows == 1 && c.dupRows == 1 && c.rowsOut == 2)
    assert(c.fkViolations("dept_id->depts.dept_id") == 0)
    assert(spark.read.parquet(s"$out/courses").count() == 2)
  }

  test("dirty rebuild: FK violation blocks ALL snapshot writes") {
    val dir = Files.createTempDirectory("graft_rebuild_bad").toString
    writeInputs(dir, Seq("1,10,3.0", "2,99,4.0"))  // dept 99 does not exist
    val out = s"$dir/out"
    val reports = Rebuild.run(spark, dir, out, plan).map(r => r.table -> r).toMap
    assert(reports("courses").fkViolations("dept_id->depts.dept_id") == 1)
    assert(!Files.exists(Paths.get(s"$out/courses")), "dirty build must not write")
    assert(!Files.exists(Paths.get(s"$out/depts")), "all-or-nothing: no partial snapshot")
  }

  test("missing generation aborts the rebuild") {
    val dir = Files.createTempDirectory("graft_rebuild_missing").toString
    Files.writeString(Paths.get(s"$dir/DEPTS-20250101.csv"),
      "dept_id,dept_name\n10,math\n")
    intercept[IllegalStateException] {
      Rebuild.run(spark, dir, s"$dir/out", plan)
    }
  }
}
