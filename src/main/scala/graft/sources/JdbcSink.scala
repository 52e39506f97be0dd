package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement, SQLException, Types}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Relational (JDBC) upsert sink: MERGE-shaped key-wise insert-or-update,
  * the reference engine's primary output path (`INSERT … ON CONFLICT` into
  * its catalog database). Spark's own `df.write.jdbc` only appends or
  * overwrites, so the upsert runs as batched per-partition statements — the
  * one place the engine uses executor-side imperative code, because the
  * semantics (row-level rendezvous with state held by an EXTERNAL system)
  * are genuinely outside Catalyst's reach.
  *
  * 100 TB notes:
  *  - The dataframe is repartitioned on the key columns first, so a given
  *    key is written by exactly one task — no cross-task lock contention on
  *    hot rows, and the DB sees each row once per run.
  *  - Statements batch (`addBatch`/`executeBatch`, default 500) over one
  *    connection per partition; connection setup amortizes like codec init
  *    in the multimodal path.
  *  - The upsert is idempotent per (key → row) assignment, so Spark task
  *    retries (at-least-once execution) still converge to exactly-once
  *    STATE — same algebra as the parquet-snapshot Upsert (UpsertSpec's
  *    replay law). Input must carry at most one row per key (dedupe
  *    upstream, e.g. last-wins over a version column) — duplicate keys in
  *    one batch would race their own insert.
  *  - A JDBC endpoint is the bottleneck at cluster scale by design; the
  *    intended use is dimension/catalog-sized results (the reference's
  *    shape), not shipping 100 TB through DriverManager.
  *
  * Dialects: [[UpdateThenInsert]] is the portable ANSI plan (batched UPDATE
  * by key, then INSERT for the rows the update-counts say were missed) —
  * Derby rejects `MERGE … USING (VALUES …)` ("source must be a base table
  * or table function"), so single-statement merge is NOT portable; the
  * two-statement plan runs everywhere and is what the embedded-Derby spec
  * executes. [[PostgresOnConflict]] generates the single-statement
  * `INSERT … ON CONFLICT (k) DO UPDATE` form (no Postgres server exists in
  * this container, so it is exercised as SQL-text assertions only).
  */
object JdbcSink {

  /** ANSI-quote an identifier so reserved words (`at`, `order`, `year`) work
    * as column names on Derby and Postgres alike.
    */
  private[sources] def q(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""

  sealed trait Dialect

  /** Portable two-statement upsert; see object Scaladoc. */
  case object UpdateThenInsert extends Dialect

  /** Postgres-style conflict-target upsert (SQL generation only here). */
  case object PostgresOnConflict extends Dialect {
    def upsertSql(table: String, cols: Seq[StructField], keys: Seq[String]): String = {
      val names = cols.map(_.name)
      val nonKeys = names.filterNot(keys.contains)
      val action =
        if (nonKeys.isEmpty) "DO NOTHING"
        else s"DO UPDATE SET ${nonKeys.map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")}"
      s"""INSERT INTO $table (${names.map(q).mkString(", ")})
         |VALUES (${names.map(_ => "?").mkString(", ")})
         |ON CONFLICT (${keys.map(q).mkString(", ")}) $action""".stripMargin
    }
  }

  /** `UPDATE t SET nonKeys WHERE keys`; when every column is a key the SET
    * degenerates to `k = k` so the statement still reports a hit for
    * existing rows (update-count 1) without changing them.
    */
  private[graft] def updateSql(table: String, cols: Seq[StructField],
                                 keys: Seq[String]): String = {
    val nonKeys = cols.map(_.name).filterNot(keys.contains)
    val sets =
      if (nonKeys.isEmpty) s"${q(keys.head)} = ${q(keys.head)}"
      else nonKeys.map(c => s"${q(c)} = ?").mkString(", ")
    s"UPDATE $table SET $sets WHERE ${keys.map(k => s"${q(k)} = ?").mkString(" AND ")}"
  }

  private[graft] def insertSql(table: String, cols: Seq[StructField]): String =
    s"INSERT INTO $table (${cols.map(f => q(f.name)).mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"

  /** Spark type → portable SQL type (the subset both Derby and Postgres
    * accept). Declared-output discipline applies here too: no arrays/maps/
    * structs through JDBC — serialize them first (e.g. to_json).
    */
  private[sources] def sqlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case StringType => "VARCHAR(32672)"
    case TimestampType => "TIMESTAMP"
    case DateType => "DATE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other => throw new IllegalArgumentException(
      s"JdbcSink does not map ${other.catalogString}; serialize it to a scalar first")
  }

  private def jdbcType(dt: DataType): Int = dt match {
    case LongType => Types.BIGINT
    case IntegerType => Types.INTEGER
    case ShortType => Types.SMALLINT
    case DoubleType => Types.DOUBLE
    case FloatType => Types.REAL
    case BooleanType => Types.BOOLEAN
    case StringType => Types.VARCHAR
    case TimestampType => Types.TIMESTAMP
    case DateType => Types.DATE
    case _: DecimalType => Types.DECIMAL
    case other => throw new IllegalArgumentException(other.catalogString)
  }

  /** CREATE TABLE with a primary key on `keys` if it doesn't exist yet
    * (Derby has no IF NOT EXISTS — the already-exists SQLState is X0Y32).
    */
  def ensureTable(url: String, table: String, schema: StructType,
                  keys: Seq[String]): Unit = {
    val cols = schema.fields.map { f =>
      s"${q(f.name)} ${sqlType(f.dataType)}${if (keys.contains(f.name)) " NOT NULL" else ""}"
    }
    val ddl = s"CREATE TABLE $table (${cols.mkString(", ")}, " +
      s"PRIMARY KEY (${keys.map(q).mkString(", ")}))"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(ddl)
      catch { case e: SQLException if e.getSQLState == "X0Y32" => () }
      finally st.close()
    } finally conn.close()
  }

  /** Bind `row`'s columns at positions `order` (indices into the row) to
    * statement parameters 1..order.length.
    */
  private def bind(st: PreparedStatement, order: Array[Int],
                   types: Array[Int], row: Row): Unit = {
    var p = 0
    while (p < order.length) {
      val i = order(p)
      val v = row.get(i)
      if (v == null) st.setNull(p + 1, types(i))
      else st.setObject(p + 1, v, types(i))
      p += 1
    }
  }

  /** Upsert `df` into `table` keyed by `keys`. Requires the table to exist
    * (see [[ensureTable]]). Every column of `df` must map to a scalar SQL
    * type; `keys` must be non-empty and present in the schema; at most one
    * row per key.
    */
  def upsert(df: DataFrame, url: String, table: String, keys: Seq[String],
             dialect: Dialect = UpdateThenInsert, batchSize: Int = 500): Unit = {
    require(keys.nonEmpty, "upsert requires at least one key column")
    val schema = df.schema
    keys.foreach(k => require(schema.fieldNames.contains(k),
      s"key column $k not in ${schema.fieldNames.mkString(",")}"))
    val fields = schema.fields.toSeq
    fields.foreach(f => sqlType(f.dataType)) // fail fast on unmappable types
    val types = fields.map(f => jdbcType(f.dataType)).toArray
    val allOrder = fields.indices.toArray
    val keyIdx = keys.map(schema.fieldIndex).toArray
    val nonKeyIdx = fields.indices.filterNot(keyIdx.contains).toArray
    import org.apache.spark.sql.functions.col
    val repartitioned = df.repartition(keys.map(col): _*)

    dialect match {
      case PostgresOnConflict =>
        val sql = PostgresOnConflict.upsertSql(table, fields, keys)
        repartitioned.foreachPartition { (rows: Iterator[Row]) =>
          if (rows.nonEmpty) withConnection(url) { conn =>
            val st = conn.prepareStatement(sql)
            try {
              var pending = 0
              rows.foreach { row =>
                bind(st, allOrder, types, row)
                st.addBatch()
                pending += 1
                if (pending >= batchSize) { st.executeBatch(); pending = 0 }
              }
              if (pending > 0) st.executeBatch()
              conn.commit()
            } finally st.close()
          }
        }

      case UpdateThenInsert =>
        val updSql = updateSql(table, fields, keys)
        val insSql = insertSql(table, fields)
        // UPDATE params: SET nonKeys (none when all-keys), then WHERE keys.
        val updOrder = nonKeyIdx ++ keyIdx
        repartitioned.foreachPartition { (rows: Iterator[Row]) =>
          if (rows.nonEmpty) withConnection(url) { conn =>
            val upd = conn.prepareStatement(updSql)
            val ins = conn.prepareStatement(insSql)
            try {
              val buf = new scala.collection.mutable.ArrayBuffer[Row](batchSize)
              def flush(): Unit = if (buf.nonEmpty) {
                buf.foreach { row => bind(upd, updOrder, types, row); upd.addBatch() }
                val hits = upd.executeBatch()
                var inserts = 0
                var j = 0
                while (j < hits.length) {
                  // The plan NEEDS exact batch update-counts (Derby and
                  // Postgres report them). Any negative count — -2
                  // SUCCESS_NO_INFO (Oracle; MySQL rewriteBatchedStatements)
                  // or -3 EXECUTE_FAILED under continue-on-error drivers —
                  // means we can't tell which rows were missed: fail loudly
                  // rather than silently dropping rows.
                  if (hits(j) < 0)
                    throw new IllegalStateException(
                      s"JDBC driver returned batch update count ${hits(j)}; " +
                        "UpdateThenInsert needs exact counts to detect missed rows — " +
                        "use a dialect with a conflict-target upsert on this driver")
                  if (hits(j) == 0) { bind(ins, allOrder, types, buf(j)); ins.addBatch(); inserts += 1 }
                  j += 1
                }
                if (inserts > 0) ins.executeBatch()
                buf.clear()
              }
              rows.foreach { r => buf += r; if (buf.length >= batchSize) flush() }
              flush()
              conn.commit()
            } finally { upd.close(); ins.close() }
          }
        }
    }
  }

  private def withConnection(url: String)(body: Connection => Unit): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      body(conn)
    } finally conn.close()
  }
}
