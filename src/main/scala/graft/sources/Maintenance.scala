package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Atomic-ENOUGH multi-artifact refresh (round 14 — VERDICT r13 #7):
  * "table + its materialized views + its ANN indexes" used to advance
  * in separate, individually crash-safe commits with nothing tying them
  * together — a crash between the table commit and an index refresh
  * left artifacts MUTUALLY stale with no verb to converge them. This
  * module adds the missing two pieces:
  *
  *  1. a durable ARTIFACT REGISTRY under the source table's log dir
  *     (`_graft_log/artifacts/<name>`, one tiny k=v file per artifact —
  *     same temp+rename publish as every log file): incremental views
  *     register their full refresh spec (view root, keys, group
  *     columns, measures, extrema/distinct flavor, consumer pin name);
  *     ANN indexes need no registration — their MODEL sidecars are
  *     self-describing and [[graft.engine.AnnIndex.indexes]] discovers
  *     them;
  *  2. [[refreshAll]] — walk every registered artifact and advance it
  *     to the table head, idempotently.
  *
  * The convergence contract (deliberately NOT a cross-table
  * transaction): each artifact's refresh is already exactly-once
  * against the source version it incorporates (a view IS its own
  * cursor; an index refuses staleness and refreshes by version diff),
  * so `refreshAll` after ANY crash — mid-walk, mid-refresh, between
  * table commit and the walk — re-runs only the un-applied ranges and
  * double-applies nothing. A commit landing DURING the walk simply
  * leaves later artifacts one version ahead of earlier ones until the
  * next `refreshAll`, exactly as it would under per-artifact cron
  * refreshes; rerunning converges. This is the Delta/Iceberg posture:
  * derived artifacts chase the table through idempotent maintenance,
  * not through a distributed transaction spanning storage systems.
  */
object Maintenance {

  /** A registered incremental view's full refresh spec. Exactly one of
    * the three flavors applies: `distinctCol` set → theta-sketch
    * distinct view; `keys` set → keyed CDC maintenance; neither → the
    * keyless row-id feed (requires row tracking on the source).
    */
  final case class ViewSpec(viewRoot: String,
                            groupCols: Seq[String],
                            measures: Seq[String] = Nil,
                            keys: Option[Seq[String]] = None,
                            extrema: Boolean = false,
                            distinctCol: Option[String] = None,
                            consumer: Option[String] = None)

  private def artifactsDir(root: String): Path =
    new Path(new Path(root.replaceAll("/+$", ""), "_graft_log"), "artifacts")

  private def artifactPath(root: String, name: String): Path = {
    // a leading dot would register durably yet be INVISIBLE to the
    // registry listing (dot files are temp debris there) and could
    // collide with the .tmp_ staging convention — refuse loudly
    require(name.nonEmpty && !name.contains("/") && !name.startsWith("."),
      s"artifact name must be a plain token (no '/', no leading '.'), " +
      s"got '$name'")
    new Path(artifactsDir(root), name)
  }

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  /** Register (or replace) view `name`'s refresh spec on its SOURCE
    * table. Registration is what [[refreshAll]] walks; refreshes keep
    * working un-registered, they just aren't converged by the verb.
    */
  def registerView(spark: SparkSession, sourceRoot: String, name: String,
                   spec: ViewSpec): Unit = {
    require(spec.groupCols.nonEmpty, "groupCols must be non-empty")
    require(spec.distinctCol.isEmpty || spec.measures.isEmpty,
      "a distinct view has no additive measures")
    require(spec.distinctCol.nonEmpty || spec.measures.nonEmpty,
      "an additive view needs at least one measure")
    val p = artifactPath(sourceRoot, name)
    val f = fs(spark, p)
    f.mkdirs(p.getParent)
    val text = (Seq(
      "kind=view",
      s"viewRoot=${enc(spec.viewRoot)}",
      s"groupCols=${spec.groupCols.map(enc).mkString(",")}") ++
      (if (spec.measures.nonEmpty)
         Seq(s"measures=${spec.measures.map(enc).mkString(",")}") else Nil) ++
      spec.keys.map(ks => s"keys=${ks.map(enc).mkString(",")}").toSeq ++
      (if (spec.extrema) Seq("extrema=true") else Nil) ++
      spec.distinctCol.map(c => s"distinctCol=${enc(c)}").toSeq ++
      spec.consumer.map(c => s"consumer=${enc(c)}").toSeq).mkString("\n")
    val tmp = new Path(p.getParent, s".tmp_$name")
    val out = f.create(tmp, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      p.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Remove view `name` from the registry (the view table itself and
    * its consumer pin are untouched — drop those separately).
    */
  def unregisterView(spark: SparkSession, sourceRoot: String,
                     name: String): Unit = {
    val p = artifactPath(sourceRoot, name)
    fs(spark, p).delete(p, false)
  }

  /** Every registered view: name → spec. */
  def registeredViews(spark: SparkSession,
                      sourceRoot: String): Map[String, ViewSpec] = {
    val d = artifactsDir(sourceRoot)
    val f = fs(spark, d)
    if (!f.exists(d)) return Map.empty
    f.listStatus(d).filter(st => st.isFile &&
        !st.getPath.getName.startsWith(".")).flatMap { st =>
      val in = f.open(st.getPath)
      val text = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val kv = text.linesIterator.filter(_.contains("="))
        .map { l => val Array(a, b) = l.split("=", 2); (a, b) }.toMap
      if (!kv.get("kind").contains("view")) None
      else scala.util.Try(ViewSpec(
        viewRoot = dec(kv("viewRoot")),
        groupCols = kv("groupCols").split(",").toSeq.map(dec),
        measures = kv.get("measures")
          .map(_.split(",").toSeq.map(dec)).getOrElse(Nil),
        keys = kv.get("keys").map(_.split(",").toSeq.map(dec)),
        extrema = kv.get("extrema").contains("true"),
        distinctCol = kv.get("distinctCol").map(dec),
        consumer = kv.get("consumer").map(dec)
      )).toOption.map(st.getPath.getName -> _)
    }.toMap
  }

  private def refreshView(spark: SparkSession, sourceRoot: String,
                          spec: ViewSpec): Option[(Long, Long)] =
    spec.distinctCol match {
      case Some(dc) =>
        IncrementalView.refreshDistinct(spark, sourceRoot, spec.viewRoot,
          spec.groupCols, dc, spec.consumer)
      case None => (spec.keys, spec.extrema) match {
        case (Some(ks), false) => IncrementalView.refreshMulti(spark,
          sourceRoot, spec.viewRoot, ks, spec.groupCols, spec.measures,
          spec.consumer)
        case (Some(ks), true) => IncrementalView.refreshMultiWithExtrema(
          spark, sourceRoot, spec.viewRoot, ks, spec.groupCols,
          spec.measures, spec.consumer)
        case (None, false) => IncrementalView.refreshByRowIdMulti(spark,
          sourceRoot, spec.viewRoot, spec.groupCols, spec.measures,
          spec.consumer)
        case (None, true) => IncrementalView.refreshByRowIdMultiWithExtrema(
          spark, sourceRoot, spec.viewRoot, spec.groupCols, spec.measures,
          spec.consumer)
      }
    }

  /** Advance EVERY derived artifact of `root` — registered views, then
    * all persisted ANN indexes — to the table head. Idempotent and
    * convergent: each artifact's refresh applies only its un-applied
    * version range (see class doc), so rerunning after any crash
    * finishes the walk without double-applying. Returns artifact →
    * version it now covers.
    */
  def refreshAll(spark: SparkSession, root: String): Map[String, Long] = {
    val anns = graft.engine.AnnIndex.indexes(spark, root).map {
      case (name, _) =>
        s"ann:$name" -> graft.engine.AnnIndex.refresh(spark, root, name)
    }
    (refreshRegisteredViews(spark, root).map {
      case (n, v) => s"view:$n" -> v
    }.toSeq ++ anns).toMap
  }

  /** The view half of [[refreshAll]]: advance every REGISTERED view to
    * the source head (the streaming sink's `mvRefresh` rides this —
    * its ANN half has its own option). Returns view name → the source
    * version it now incorporates.
    */
  def refreshRegisteredViews(spark: SparkSession,
                             root: String): Map[String, Long] =
    registeredViews(spark, root).toSeq.sortBy(_._1).map {
      case (name, spec) =>
        refreshView(spark, root, spec)
        name -> SnapshotLog.lastBatchId(spark, spec.viewRoot).getOrElse(0L)
    }.toMap
}
