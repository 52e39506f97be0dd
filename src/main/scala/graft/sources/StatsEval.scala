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
    * "d" = dir-fully-listed marker) and anything malformed.
    */
  def parseSpan(line: String): Option[(String, String, String, String, String)] =
    line.split("\t", -1) match {
      case Array(file, c, tag, mn, mx)
          if tag != "b" && tag != "f" && tag != "d" =>
        Some((unesc(file), unesc(c), tag, mn, mx))
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
}
