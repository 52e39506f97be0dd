package graft.sources

/** Span-line evaluation for the skipping-stats sidecar, shared by the
  * driver-side path ([[SnapshotLog.candidateFiles]] under the size
  * threshold) and the DISTRIBUTED path (a Spark job over the sidecar
  * above it). One implementation for parse + overlap means the two
  * paths cannot drift — the distributed filter closure runs exactly the
  * comparisons the driver would. Serializable: executor closures close
  * over this object.
  *
  * Semantics carried over verbatim from the round-6/7 hardening:
  *  - all-null files (NullMark bounds) prune for any probe;
  *  - numeric ("n") spans compare as BigDecimal; a non-finite stored
  *    bound or probe proves nothing → KEEP (stats only remove
  *    provably-empty work);
  *  - string/temporal spans compare in CODE-POINT order (== UTF-8
  *    binary == Spark's UTF8String min/max; Java UTF-16 compareTo
  *    disagrees for supplementary chars and could wrongly prune).
  */
private[sources] object StatsEval extends Serializable {

  val NullMark = "\\N"

  def unesc(s: String): String = {
    val b = new StringBuilder; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => b += '\t'; case 'n' => b += '\n'; case x => b += x
        }; i += 2
      } else { b += c; i += 1 }
    }
    b.toString
  }

  def cpLess(a: String, b: String): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(i)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca)
    }
    a.length < b.length
  }

  /** A span sidecar line → (fileKey, column, tag, min, max); None for
    * bloom ("b") lines, file-manifest listing lines ("f" = file entry,
    * "d" = dir-fully-listed marker), null-count lines ("z" — their two
    * numbers are counts, not value bounds) and anything malformed.
    */
  def parseSpan(line: String): Option[(String, String, String, String, String)] =
    line.split("\t", -1) match {
      case Array(file, c, tag, mn, mx)
          if tag != "b" && tag != "f" && tag != "d" && tag != "z" &&
             tag != "r" => // "r" = row-id base assignment, not a span
        Some((unesc(file), unesc(c), tag, mn, mx))
      case _ => None
    }

  /** A null-count sidecar line ("z": fileKey, column, nullCount,
    * valueCount) → (fileKey, column, nulls, total). What IS NULL /
    * IS NOT NULL pruning runs on.
    */
  def parseNulls(line: String): Option[(String, String, Long, Long)] =
    line.split("\t", -1) match {
      case Array(file, c, "z", n, t) =>
        scala.util.Try((unesc(file), unesc(c), n.toLong, t.toLong)).toOption
      case _ => None
    }

  /** A file-manifest sidecar line → (fileKey, tag, len/mtime fields);
    * the read-planning counterpart of [[parseSpan]]. `f` lines carry
    * `dir/name → (length, mtime)`; `d` lines mark `dir/` as fully
    * listed (required before a reader may trust the absence of more
    * `f` lines for that dir).
    */
  def parseListing(line: String): Option[(String, String, String, String)] =
    line.split("\t", -1) match {
      case Array(file, _, tag, a, b) if tag == "f" || tag == "d" =>
        Some((unesc(file), tag, a, b))
      case _ => None
    }

  /** Does a stored span overlap the probe window? Probes arrive
    * pre-rendered (the driver computes them once): `loS`/`hiS` through
    * the temporal/string serialization, `loN`/`hiN` as parsed decimals
    * (None when the probe itself is non-finite → keep).
    */
  def overlaps(tag: String, mn: String, mx: String,
               loS: String, hiS: String,
               loN: Option[BigDecimal], hiN: Option[BigDecimal]): Boolean = {
    if (mn == NullMark || mx == NullMark) return false // all-null file
    if (tag == "n") {
      (loN, hiN) match {
        case (Some(l), Some(h)) =>
          scala.util.Try {
            !(BigDecimal(unesc(mx)) < l || BigDecimal(unesc(mn)) > h)
          }.getOrElse(true)
        case _ => true
      }
    } else !(cpLess(unesc(mx), loS) || cpLess(hiS, unesc(mn)))
  }

  // temporal probe serialization: lexicographic == chronological (the
  // exact strings the sidecar build pass renders — see the SnapshotLog
  // footer decode, which shares these patterns)
  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** Render a range-probe value the way the build pass rendered the
    * stored min/max (moved here from SnapshotLog so the DISTRIBUTED
    * pruning closures run the identical rendering). LTZ instants go
    * through the caller's session zone; NTZ/DATE are wall-clock.
    */
  def probeString(x: Any, zone: java.time.ZoneId): String = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern(TsFmt)
    x match {
      case t: java.sql.Timestamp       =>
        java.time.LocalDateTime.ofInstant(t.toInstant, zone).format(fmt)
      case d: java.time.LocalDateTime  => d.format(fmt)
      case i: java.time.Instant        =>
        java.time.LocalDateTime.ofInstant(i, zone).format(fmt)
      case d: java.sql.Date            => d.toLocalDate.toString
      case d: java.time.LocalDate      => d.toString
      case other                       => other.toString
    }
  }

  /** Half-open-capable span test shared by the explicit probes and the
    * FileIndex pruner (driver AND executor sides): can a file whose
    * sidecar records [mn, mx] (tag "n" numeric / "s" code-point)
    * contain a value in [lo, hi]? Unparseable bounds keep the file —
    * stats only ever remove provably-empty work.
    */
  def spanOverlaps(tag: String, mn: String, mx: String,
                   lo: Option[Any], hi: Option[Any],
                   zone: java.time.ZoneId,
                   loStrict: Boolean = false,
                   hiStrict: Boolean = false): Boolean = {
    if (mn == NullMark || mx == NullMark) return false // all-null file
    if (tag == "n")
      scala.util.Try {
        hi.forall { h =>
          val b = BigDecimal(h.toString); val m = BigDecimal(unesc(mn))
          if (hiStrict) m < b else m <= b // any row can sit below the bound
        } &&
        lo.forall { l =>
          val b = BigDecimal(l.toString); val m = BigDecimal(unesc(mx))
          if (loStrict) m > b else m >= b
        }
      }.getOrElse(true)
    else
      scala.util.Try {
        hi.forall { h =>
          val b = probeString(h, zone)
          if (hiStrict) cpLess(unesc(mn), b) else !cpLess(b, unesc(mn))
        } &&
        lo.forall { l =>
          val b = probeString(l, zone)
          if (loStrict) cpLess(b, unesc(mx)) else !cpLess(unesc(mx), b)
        }
      }.getOrElse(true)
  }

  /** The comparison shapes the skipping FileIndex can prove things
    * about, compiled OUT of Catalyst expression trees on the driver
    * (Catalyst `Expression`s are not closure-shippable; these plain
    * case classes are). One evaluator — [[admits]] — serves both the
    * in-memory span map and the distributed parquet-checkpoint pruner,
    * so the two paths cannot drift.
    */
  sealed trait SpanPred extends Serializable
  case object TruePred extends SpanPred
  final case class RangePred(col: String, lo: Option[Any], hi: Option[Any],
                             loStrict: Boolean, hiStrict: Boolean) extends SpanPred
  final case class InPred(col: String, vs: Seq[Any]) extends SpanPred
  final case class IsNullPred(col: String) extends SpanPred
  final case class NotNullPred(col: String) extends SpanPred
  final case class AndPred(a: SpanPred, b: SpanPred) extends SpanPred
  final case class OrPred(a: SpanPred, b: SpanPred) extends SpanPred

  /** Every column a compiled predicate consults — what the distributed
    * checkpoint prune filters its span/null rows to (a 10-stats-column
    * table's verdict shuffle carries only the probed columns' rows).
    */
  def predCols(p: SpanPred): Set[String] = p match {
    case TruePred => Set.empty
    case RangePred(c, _, _, _, _) => Set(c)
    case InPred(c, _) => Set(c)
    case IsNullPred(c) => Set(c)
    case NotNullPred(c) => Set(c)
    case AndPred(a, b) => predCols(a) ++ predCols(b)
    case OrPred(a, b) => predCols(a) ++ predCols(b)
  }

  /** One compiled filter's verdict against one file's stats: false =
    * provably no matching rows. Unknown shapes ([[TruePred]]), missing
    * spans and missing null counts keep the file. `nullsOf` feeds the
    * IS NULL / IS NOT NULL shapes ("z" lines: a zero null count prunes
    * IS NULL; an all-null count — or a NullMark span — prunes
    * IS NOT NULL, the filter Catalyst pushes for nearly every
    * null-intolerant predicate).
    */
  def admits(spanOf: String => Option[(String, String, String)],
             nullsOf: String => Option[(Long, Long)],
             p: SpanPred, zone: java.time.ZoneId): Boolean = p match {
    case TruePred => true
    case RangePred(c, lo, hi, ls, hs) => spanOf(c) match {
      case Some((tag, mn, mx)) => spanOverlaps(tag, mn, mx, lo, hi, zone, ls, hs)
      case None => true
    }
    case InPred(c, vs) =>
      vs.exists(v => admits(spanOf, nullsOf,
        RangePred(c, Some(v), Some(v), false, false), zone))
    case IsNullPred(c) => nullsOf(c) match {
      case Some((n, _)) => n > 0
      case None => true
    }
    case NotNullPred(c) => nullsOf(c) match {
      case Some((n, t)) => n < t
      case None => spanOf(c) match {
        case Some((_, mn, mx)) => !(mn == NullMark || mx == NullMark)
        case None => true
      }
    }
    case AndPred(a, b) =>
      admits(spanOf, nullsOf, a, zone) && admits(spanOf, nullsOf, b, zone)
    case OrPred(a, b) =>
      admits(spanOf, nullsOf, a, zone) || admits(spanOf, nullsOf, b, zone)
  }
}
