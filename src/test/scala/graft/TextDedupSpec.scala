package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextDedup
import graft.sources.Tables

/** The parameterized dedup API beyond the catalog's pinned configs. */
class TextDedupSpec extends AnyFunSuite with SharedSpark {

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables(spark, sf, "documents")

  test("lshCandidates works at non-default (numPerms=6, bands=3)") {
    val cand = TextDedup.lshCandidates(docs, numPerms = 6, nBands = 3)
    val rows = cand.collect()
    assert(rows.nonEmpty)
    // shared_bands bounded by the band count; pairs ordered a < b
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 3)
      assert(r.getLong(0) < r.getLong(1))
    }
  }

  test("bands rejects a non-divisible (numPerms, nBands) pair") {
    val sig = TextDedup.signatures(TextDedup.shingles(docs), 8)
    intercept[IllegalArgumentException] {
      TextDedup.bands(sig, numPerms = 8, nBands = 3)
    }
  }

  test("simhash width follows the bits parameter") {
    val fp16 = TextDedup.simhash(docs, bits = 16).head()
    assert(fp16.getString(1).length == 16)
    assert(fp16.getString(1).forall(c => c == '0' || c == '1'))
  }

  test("more bands at same perms never loses candidate pairs") {
    // banding theory: rows-per-band shrinks → collision probability
    // rises → the candidate set can only grow
    def pairs(nBands: Int) =
      TextDedup.lshCandidates(docs, 8, nBands)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val twoBands = pairs(2)
    val fourBands = pairs(4)
    assert(twoBands.subsetOf(fourBands))
  }
}
