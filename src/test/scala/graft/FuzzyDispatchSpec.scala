package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Scalars

/** Direct unit tests of the x66 dispatch cost model (round 15): the
  * integration evidence lives in tools/FuzzyCrossover's four measured
  * corpora; these pin the DECISIONS on synthetic probes with clear
  * margins, driver-side only (no Spark), so a recalibration that flips
  * a regime fails here by name.
  */
class FuzzyDispatchSpec extends AnyFunSuite {

  private val Cap = 3
  private val Q = 2
  private val TokenCost = 200.0

  private def decide(probe: Seq[(String, String)]): Boolean =
    Scalars.bruteWinsByCost(
      probe.iterator.map { case (b, n) =>
        (b, if (n == null) null else n.take(128), if (n == null) 0 else n.length)
      }, Cap, Q, TokenCost)

  test("a sampled probe scales to the same decision as the full corpus") {
    // 2-block diverse corpus decided PREFIX at full size; a 1/4 sample
    // with scale=4 must agree (pair masses scale by 16, T by 4 -- the
    // (n/s) division in the model keeps the comparison consistent)
    def full = (0 until 16000).map(i => (s"B${i % 2}", hashish(i, 48)))
    def tuple3(p: Seq[(String, String)]) =
      p.iterator.map { case (b, n) => (b, n.take(128), n.length) }
    assert(!Scalars.bruteWinsByCost(tuple3(full), Cap, Q, TokenCost))
    val sample = full.take(4000)
    assert(!Scalars.bruteWinsByCost(tuple3(sample), Cap, Q, TokenCost,
      scale = 4.0), "the scaled sample must also choose prefix")
    // and a brute-favoring corpus stays brute under the same scaling
    def bruteish = (0 until 12000).map(i => (s"B${i % 25}", hashish(i, 48)))
    assert(Scalars.bruteWinsByCost(tuple3(bruteish.take(3000)), Cap, Q,
      TokenCost, scale = 4.0))
  }

  /** Deterministic hash-like string: diverse grams, no clustering. */
  private def hashish(i: Int, len: Int): String = {
    val sb = new StringBuilder
    var x = i * 2654435761L + 17
    while (sb.length < len) {
      x = x * 6364136223846793005L + 1442695040888963407L
      sb.append(java.lang.Long.toHexString(x & 0xffffffffL))
    }
    sb.take(len).toString
  }

  test("parts-like corpus (25 blocks, 9-char names from a tiny vocab) → brute") {
    // the fixture shape that measured brute-fastest at every probed
    // size: tiny gram vocabulary, so candidate buckets ≈ brute pairs
    val words = Seq("almond", "antique", "azure", "beige", "bisque",
      "blanched", "blush", "burlywood", "chartreuse", "chiffon")
    val probe = (0 until 20000).map { i =>
      (s"B${i % 25}", words(i % 10) + " " + words((i / 3) % 10))
    }
    assert(decide(probe), "tie-rich vocab corpus must dispatch to brute")
  }

  test("gram-diverse corpus at healthy block count → brute (abandons are cheap)") {
    // the corpus that killed the avgLen model: buckets collapse but the
    // extra pairs abandon the banded DP almost immediately — measured
    // brute 0.95 s vs pipeline 3.09 s at 16k/25 blocks
    val probe = (0 until 12000).map(i => (s"B${i % 25}", hashish(i, 48)))
    assert(decide(probe),
      "diverse grams alone must NOT flip to prefix at moderate pair mass")
  }

  test("extreme block-pair mass over diverse grams → prefix") {
    // 2 blocks × 16k rows = ~64M candidate pairs; even at abandon cost
    // that buries the token pipeline — the one regime below the row
    // bound where prefix is right
    val probe = (0 until 16000).map(i => (s"B${i % 2}", hashish(i, 48)))
    assert(!decide(probe),
      "tens of millions of abandons must outweigh the token pipeline")
  }

  test("all-short corpus (every gram destructible) → brute") {
    // len ≤ cap·q + q − 1 = 7: the short residue pairs everyone anyway,
    // so the prefix filter cannot remove work
    val probe = (0 until 5000).map(i => (s"B${i % 25}", hashish(i, 6)))
    assert(decide(probe), "an all-short corpus must dispatch to brute")
  }

  test("degenerate probes (empty, null names, single row) → brute") {
    assert(decide(Nil))
    assert(decide(Seq(("B1", null))))
    assert(decide(Seq(("B1", "onlyrow"))))
  }
}
