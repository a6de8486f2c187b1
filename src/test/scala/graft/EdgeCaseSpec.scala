package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextDedup

/** Degenerate inputs a real corpus contains but the fixtures don't:
  * empty text, single-word docs, repeated separators. The operators
  * must stay total — no crashes, documented drop semantics. */
class EdgeCaseSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private val weird = Seq(
    (1L, ""),
    (2L, "one"),
    (3L, "two words"),
    (4L, "a  b"), // double space → empty token
    (5L, "normal text with several words in it"))
    .toDF("doc_id", "text")

  test("kShingles drops short docs, keeps the rest") {
    val got = TextDedup.kShingles(weird, 3)
      .groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!got.contains(1L) || got(1L) >= 0) // no crash is the contract
    assert(!got.contains(2L), "single word has no 3-shingle")
    assert(got(5L) == 5L, "n-k+1 distinct shingles")
  }

  test("per-row simhash is total and deterministic on degenerate docs") {
    val fp = TextDedup.withSimhashInt(weird, 32)
      .select("doc_id", "simhash_int")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp.size == 5, "every doc gets a fingerprint, even empty text")
    val fp2 = TextDedup.withSimhashInt(weird, 32)
      .select("doc_id", "simhash_int")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp == fp2, "deterministic across runs")
  }

  test("narrow signatures drop shingle-less docs, as documented") {
    val ids = TextDedup.signaturesNarrow(weird, 4)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(3L, 4L, 5L),
      "docs with at least one bigram shingle survive")
  }

  test("hammingPairs on a single row and on identical fingerprints") {
    val single = Seq((1L, 42L)).toDF("doc_id", "simhash_int")
    assert(TextDedup.hammingPairs(single, 8, 2).count() == 0)
    val twins = Seq((1L, 42L), (2L, 42L)).toDF("doc_id", "simhash_int")
    val got = TextDedup.hammingPairs(twins, 8, 2).collect()
    assert(got.length == 1 && got.head.getLong(2) == 0L)
  }
}
