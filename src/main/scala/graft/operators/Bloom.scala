package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter pre-join gating — the standard shape for joining a
  * 100 TB fact side against a key set that is too large to broadcast
  * as exact rows but compresses to megabytes as a filter.
  *
  * Build once on the small side (`buildLong` — Spark's public
  * `DataFrameStatFunctions.bloomFilter`, one aggregate job whose
  * per-partition filters OR-merge on the driver), then gate the big
  * side with a narrow codegen'd probe (`gateLong` →
  * functions.BloomMightContain; filters past 64 KiB are lifted into a
  * broadcast-backed probe at resolution time — see
  * functions.BloomMightContainBcast for why megabyte literals are a
  * per-stage task-binary payload and a driver planning tax) BEFORE its
  * exchange: only probable matches pay the shuffle, cutting shuffled
  * volume to roughly the true-match rate plus `fpp`. Because a Bloom
  * filter has no false negatives, gating never changes the downstream
  * exact join's result — only its cost.
  */
object Bloom {

  /** Serialized Bloom filter over a LONG key column of `df`.
    *
    * `expectedItems` sizes the bit array (~1.2 MB per million items at
    * fpp 0.03); overshooting wastes proportional broadcast bytes,
    * undershooting only degrades fpp — correctness is unaffected
    * either way, so a generous static estimate beats a pre-count job. */
  def buildLong(df: DataFrame, keyCol: String,
                expectedItems: Long = 1L << 20,
                fpp: Double = 0.03): Array[Byte] = {
    // Spark's stat.bloomFilter NPEs on an empty input (its aggregate
    // yields a null buffer); an empty key set is a legal degenerate —
    // an all-zero-bits filter that admits nothing (EdgeCaseSpec).
    // Recover from the NPE instead of pre-checking with df.isEmpty:
    // the pre-check was a whole extra Spark job paid by EVERY build on
    // the overwhelmingly common non-empty path (ADVICE r8). The catch
    // CONFIRMS emptiness OF THE KEY SET — not of the frame: the
    // aggregate skips NULL keys, so a non-empty input whose keys are
    // all NULL yields the same null buffer as zero rows, and the
    // empty filter is the correct degenerate for it too. An unrelated
    // NPE on a real key set must still propagate, because an all-zero
    // filter over real keys would silently drop every row at the gate
    // (the one way this operator can break its no-false-negative
    // contract). The confirm job runs only on the NPE path.
    val f =
      try df.stat.bloomFilter(keyCol, expectedItems, fpp)
      catch {
        case npe: NullPointerException =>
          if (df.filter(col(keyCol).isNotNull).isEmpty)
            // minimal capacity, NOT expectedItems: a no-member filter
            // of any size admits nothing (zero bits set ⇒ every probe
            // misses), so sizing it for a million keys would carry
            // ~0.9 MB of zero bits into every gate's broadcast for
            // identical semantics (r20 review)
            org.apache.spark.util.sketch.BloomFilter.create(1, fpp)
          else throw npe
      }
    val bos = new java.io.ByteArrayOutputStream()
    f.writeTo(bos)
    bos.toByteArray
  }

  /** Membership-probe predicate over serialized filter bytes: keeps
    * every true member (no false negatives) plus ~fpp of non-members. */
  def gateLong(spark: org.apache.spark.sql.SparkSession,
               filterBytes: Array[Byte], key: Column): Column = {
    graft.GraftExtensions.ensure(spark)
    call_function("bloom_might_contain", lit(filterBytes), key)
  }
}
