package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-column data-layout key
  * behind "cluster by (a, b)" in lakehouse table formats. Sorting by a
  * single column gives parquet row-group min/max pruning on that column
  * only; sorting by the bit-interleaved key gives BOTH columns bounded
  * spans inside every contiguous chunk of the sort order, so a filter
  * on either column (or both) skips most files.
  *
  * Scale stance: the key is pure integer arithmetic (shift/and/or per
  * bit), fully codegen'd, computed in the map stage of the write's
  * `repartitionByRange` — no extra pass, no shuffle beyond the range
  * exchange the sorted write needs anyway. `writeZOrdered` is the
  * production face; `key2` is the expression for ad-hoc use and the
  * catalog query's oracle parity (`duckKeyExpr2` emits the identical
  * arithmetic for DuckDB).
  */
object ZOrder {

  /** Interleave the low `bits` of two non-negative ints: bit i of `a`
    * lands at position 2i+1, bit i of `b` at 2i (a is the major key at
    * every scale). Inputs must fit `bits` (callers scale/clamp first —
    * a value ≥ 2^bits would alias with its low bits and silently break
    * locality). */
  def key2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in 1..31, got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
  }

  /** The same interleave as ANSI/DuckDB SQL text, for oracle parity.
    * The masked bit is cast to BIGINT BEFORE the shift: the Spark
    * side is promoted to long by the `lit(1L)` mask, but DuckDB
    * shifts in the COLUMN's type — over INTEGER columns a shift
    * position ≥ 32 (any bits ≥ 17 puts 2i+1 there) raises
    * "Left-shift value out of range" instead of computing the key,
    * and bits 16 would silently wrap where Spark doesn't. */
  def duckKeyExpr2(a: String, b: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in 1..31, got $bits")
    (0 until bits).map { i =>
      s"(CAST((($a >> $i) & 1) AS BIGINT) << ${2 * i + 1}) + " +
        s"(CAST((($b >> $i) & 1) AS BIGINT) << ${2 * i})"
    }.mkString("(", " + ", ")")
  }

  /** Write `df` parquet-sorted by the z-key of (a, b): range-partition
    * on the key (one exchange — the same one any sorted write costs),
    * sort within partitions, drop the key, write. Each output file
    * then holds a contiguous z-range, i.e. a bounded rectangle in
    * (a, b) space, so parquet footer min/max prune on BOTH columns. */
  def writeZOrdered(df: DataFrame, a: String, b: String, bits: Int,
                    path: String, numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be positive, got $numFiles")
    // withColumn REPLACES an existing column of the same name, and
    // the trailing drop would then silently delete the caller's data
    // from the written output — refuse loudly instead
    require(!df.columns.contains("__zkey"),
      "writeZOrdered: input already has a __zkey column — rename it " +
        "(the write would silently overwrite and then drop it)")
    df.withColumn("__zkey", key2(col(a), col(b), bits))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }
}
