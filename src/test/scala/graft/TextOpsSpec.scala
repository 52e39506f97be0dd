package graft

import org.apache.spark.sql.functions._
import graft.engine.TextOps

class TextOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("simhash: identical docs have distance 0, perturbed docs are close, unrelated far") {
    val base = "spark executes distributed dataframe pipelines with catalyst optimizing " +
      "logical plans into efficient physical operators across many partitions"
    val docs = Seq(
      (1L, base),
      (2L, base),
      (3L, base.replace("efficient", "speedy")),
      (4L, "entirely unrelated content about cooking pasta with tomatoes basil and olive oil at home")
    ).toDF("doc_id", "text")
    val fp = TextOps.withSimhash(docs).select("doc_id", "simhash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(2L)) == 0)
    assert(ham(fp(1L), fp(3L)) < ham(fp(1L), fp(4L)),
      s"perturbed ${ham(fp(1L), fp(3L))} !< unrelated ${ham(fp(1L), fp(4L))}")
  }

  test("simhashNearDups chunk blocking is exact for Hamming <= 3 (vs brute force)") {
    // corpus: an exact duplicate pair, perturbed variants, unrelated docs
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base),                                       // exact dup: distance 0
      (3L, base.replace("token7 ", "token7x ")),        // near: distance small
      (4L, base.replace("token7 ", "x ").replace("token21 ", "y ")),
      (5L, (100 to 160).map(i => s"other$i").mkString(" ")),
      (6L, (200 to 260).map(i => s"more$i").mkString(" "))
    ).toDF("doc_id", "text")
    // ground truth by brute force over the fingerprints
    val fps = TextOps.withSimhash(docs).select("doc_id", "simhash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val expected = (for {
      (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
      if java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (ia, ib)).toSeq
    assert(expected.contains((1L, 2L)), "exact duplicate must be ground truth")
    val found = TextOps.simhashNearDups(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(found == expected, s"found=$found expected=$expected")
  }

  test("fingerprint is order-sensitive, deterministic") {
    val docs = Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b c")).toDF("doc_id", "text")
    val fp = docs.withColumn("f", TextOps.fingerprint("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fp(1L) == fp(3L))
    assert(fp(1L) != fp(2L))
  }

  test("BPE-ish and whitespace token counts") {
    val df = Seq(("hello world, it's 42 tokens!", 1)).toDF("text", "id")
      .select(TextOps.tokenCountBpe("text").as("bpe"),
              TextOps.tokenCountWs(col("text")).as("ws"))
    val r = df.head()
    // hello | world | , | it | ' | s | 42 | tokens | !  = 9
    assert(r.getInt(0) == 9, s"bpe=${r.getInt(0)}")
    assert(r.getInt(1) == 5, s"ws=${r.getInt(1)}")
  }

  test("langId identifies clear-cut samples and falls back to und") {
    val samples = Seq(
      ("the cat is in the house and it is happy", "en"),
      ("der hund ist nicht in das haus und die katze", "de"),
      ("el perro es grande y la casa es bonita en los campos", "es"),
      ("le chat est dans la maison et les oiseaux dans une cage", "fr"),
      ("我 是 一 个 人 这 是 我 的 家", "zh"),
      ("zzz qqq xxx", "und"))
    val out = samples.zipWithIndex.map { case ((t, _), i) => (i, t) }
      .toDF("id", "text")
      .withColumn("lang", TextOps.langId(col("text")))
      .orderBy("id").collect().map(_.getString(2)).toSeq
    assert(out == samples.map(_._2), out.toString)
  }

  test("quality score is bounded, favors diverse text over repetition") {
    val df = Seq(
      (1L, "a diverse document with many distinct informative tokens about varied topics here"),
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
      (3L, "")
    ).toDF("doc_id", "text")
    val q = TextOps.withQualityScore(df).select("doc_id", "quality")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(1L) > q(2L))
  }

  test("quality + text stats run at scale shape on real documents") {
    val docs = graft.engine.Tables.documents(spark, sf0001)
    val out = TextOps.withQualityScore(docs)
    assert(out.count() == docs.count())
    assert(out.schema.fieldNames.contains("quality"))
  }

  test("redactPii scrubs emails, cards, SSNs, IPs, phones and flags touched rows") {
    import spark.implicits._
    val rows = Seq(
      (1L, "contact alice.smith+test@sub.example.co.uk for details"),
      (2L, "card 4111 1111 1111 1111 exp 12/27"),
      (3L, "ssn 123-45-6789 on file"),
      (4L, "server at 192.168.1.250 port 8080"),
      (5L, "call +1 (212) 555-0142 or 030-1234-5678"),
      (6L, "nothing sensitive here, just the year 2026")
    ).toDF("id", "text")
    val out = TextOps.redactPii(rows).orderBy("id")
      .select("text_redacted", "was_redacted")
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    assert(out(0)._1 == "contact [EMAIL] for details", out(0)._1)
    assert(out(1)._1 == "card [CARD] exp 12/27", out(1)._1)
    assert(out(2)._1 == "ssn [SSN] on file", out(2)._1)
    assert(out(3)._1 == "server at [IP] port 8080", out(3)._1)
    assert(out(4)._1.contains("[PHONE]") && !out(4)._1.exists(_.isDigit), out(4)._1)
    assert(out(5)._1 == "nothing sensitive here, just the year 2026")
    assert(out.map(_._2).toSeq == Seq(true, true, true, true, true, false))
  }

  test("compression ratio: repetitive text compresses far below diverse text; edge cases") {
    import spark.implicits._
    val diverse = (1 to 400).map(i => s"w${i * 7919 % 9973}x").mkString(" ")
    val rows = Seq(
      (1L, "spam " * 400),                  // pure repetition
      (2L, diverse),                        // high-entropy tokens
      (3L, ""),                             // empty
      (4L, null.asInstanceOf[String]),      // null fact
      (5L, "short")                         // tiny: deflate overhead can exceed 1.0
    ).toDF("id", "text")
    val out = TextOps.withCompressionRatio(rows).orderBy("id")
      .select("compression_ratio").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val rep = out(0).get
    val div = out(1).get
    assert(rep < 0.05, s"repetition should crush: $rep")
    assert(div > 0.3, s"diverse text should resist: $div")
    assert(rep < div / 5, s"separation too weak: rep=$rep div=$div")
    assert(out(2).contains(1.0), s"empty text convention: ${out(2)}")
    assert(out(3).isEmpty, "null text must stay a NULL fact")
    assert(out(4).exists(_ > 0.0))
    // schema: original columns preserved + one new double column
    assert(TextOps.withCompressionRatio(rows).columns.toSeq ==
      Seq("id", "text", "compression_ratio"))
  }

  test("NFKC normalization folds compatibility forms; dedup sees them as equal") {
    import spark.implicits._
    val rows = Seq(
      (1L, "ﬁle"),                     // 'ﬁ' ligature → "file"
      (2L, "file"),
      (3L, "１２３"),           // fullwidth digits → "123"
      (4L, "éclair"),                 // combining accent → é (composed)
      (5L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val out = TextOps.withNfkc(rows).orderBy("id")
      .select("text_nfkc").collect().map(r => Option(r.getString(0)))
    assert(out(0).contains("file") && out(0) == out(1), out(0).toString)
    assert(out(2).contains("123"), out(2).toString)
    assert(out(3).contains("éclair"), out(3).toString) // composed é
    assert(out(4).isEmpty)
    // the point of normalizing before dedup: ligature and plain forms
    // now hash identically
    val distinct = TextOps.withNfkc(rows).filter($"text_nfkc".isNotNull)
      .select("text_nfkc").distinct().count()
    assert(distinct == 3, s"expected file/123/éclair, got $distinct")
  }
}
