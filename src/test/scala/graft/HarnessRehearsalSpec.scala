package graft

import java.nio.file.{Files, Paths}

/** SURVEY §5.2.7: rehearse the driver's Verify invocation end-to-end.
  * Verify.main swallows per-query exceptions (a crashing query silently
  * becomes a missing output dir and a zero for that query at t2) — this
  * spec turns that silence into a test failure.
  */
class HarnessRehearsalSpec extends SparkSpecBase {

  test("Verify.main writes one parquet dir per declared query + parseable oracle json") {
    val out = Files.createTempDirectory("graft_verify_rehearsal").toString
    Verify.main(Array(sf0001, out))
    val missing = SparkEntry.queries.keySet.filterNot { name =>
      Files.exists(Paths.get(out, name, "_SUCCESS"))
    }
    assert(missing.isEmpty, s"queries with no successful output: $missing")

    val json = Files.readString(Paths.get(out, "oracle_sql.json"))
    // minimal JSON sanity without a JSON dep: brace-balanced, right key count
    assert(json.startsWith("{") && json.endsWith("}"))
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(json.contains("\"" + k + "\""), s"oracle json missing key $k")
    }
    // every result parquet reads back with rows
    SparkEntry.queries.keySet.foreach { name =>
      assert(spark.read.parquet(s"$out/$name").count() > 0, s"$name empty")
    }
  }
}
