package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bloom

/** Bloom pre-join gating: the no-false-negative contract that makes a
  * gated pipeline result-identical to its ungated form, plus the
  * analysis-time argument validation of the native probe. */
class BloomSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  test("gateLong keeps every true member (no false negatives)") {
    val keys = spark.range(0, 5000).select(
      xxhash64(col("id")).as("g"), col("id"))
    val members = keys.filter(col("id") % 7 === 0)
    val bits = Bloom.buildLong(members, "g")
    val gated = keys.filter(Bloom.gateLong(spark, bits, col("g")))
    // every member survives the gate…
    assert(gated.filter(col("id") % 7 === 0).count() ===
      members.count())
    // …and an exact join after the gate equals the ungated exact join
    val exactGated = gated
      .join(members.select(col("g")), "g").count()
    val exactPlain = keys
      .join(members.select(col("g")), "g").count()
    assert(exactGated === exactPlain)
  }

  test("filter admits only ~fpp false positives") {
    val members = spark.range(0, 1000).select(xxhash64(col("id")).as("g"))
    val bits = Bloom.buildLong(members, "g", expectedItems = 1000,
      fpp = 0.03)
    val nonMembers = spark.range(1000000, 1020000)
      .select(xxhash64(col("id")).as("g"))
    val fp = nonMembers.filter(Bloom.gateLong(spark, bits, col("g")))
      .count()
    assert(fp < 20000 * 0.1, s"false-positive rate too high: $fp/20000")
  }

  test("bloom_might_contain rejects bad arguments at analysis time") {
    GraftExtensions.ensure(spark)
    val df = Seq(1L, 2L).toDF("g")
    // non-foldable filter bytes
    intercept[AnalysisException] {
      df.select(expr("bloom_might_contain(CAST(CONCAT(CAST(g AS STRING)) AS BINARY), g)"))
        .collect()
    }
    // wrong key type
    val bits = Bloom.buildLong(df, "g")
    intercept[AnalysisException] {
      df.select(call_function("bloom_might_contain", lit(bits),
        lit("str"))).collect()
    }
  }

  test("large filters resolve to the broadcast probe, small stay literal") {
    GraftExtensions.ensure(spark)
    val df = Seq(1L, 2L).toDF("g")
    def resolvedProbe(bits: Array[Byte]) =
      df.filter(Bloom.gateLong(spark, bits, col("g")))
        .queryExecution.analyzed.expressions
        .flatMap(_.collect {
          case e: graft.functions.BloomMightContainBcast => e
          case e: graft.functions.BloomMightContain => e
        }).head
    // 1<<20 expected items ≈ 1 MiB of filter — must NOT ride the tree
    // as a literal (task-binary payload + Catalyst hashing tax); the
    // builder lifts it into a broadcast at resolution time
    val big = Bloom.buildLong(df, "g", expectedItems = 1L << 20)
    assert(big.length >= GraftExtensions.BloomBroadcastThreshold)
    val bcProbe = resolvedProbe(big)
    assert(bcProbe.isInstanceOf[graft.functions.BloomMightContainBcast])
    // …and the broadcast is built once per distinct byte array, not
    // once per resolution
    val again = resolvedProbe(big)
      .asInstanceOf[graft.functions.BloomMightContainBcast]
    assert(again.bc eq
      bcProbe.asInstanceOf[graft.functions.BloomMightContainBcast].bc)
    // a small filter stays a plain literal child
    val small = Bloom.buildLong(df, "g", expectedItems = 1000)
    assert(small.length < GraftExtensions.BloomBroadcastThreshold)
    assert(resolvedProbe(small)
      .isInstanceOf[graft.functions.BloomMightContain])
    // both forms keep members
    assert(df.filter(Bloom.gateLong(spark, big, col("g"))).count() === 2)
    assert(df.filter(Bloom.gateLong(spark, small, col("g"))).count() === 2)
  }

  test("probe works inside whole-stage codegen and interpreted eval") {
    val members = spark.range(0, 100).select(xxhash64(col("id")).as("g"))
    val bits = Bloom.buildLong(members, "g")
    val probe = members.select(
      Bloom.gateLong(spark, bits, col("g")).as("hit"))
    // codegen path: every member hits
    assert(probe.filter(col("hit")).count() === 100)
    // interpreted path: direct eval of the expression on a member key
    val h = members.head().getLong(0)
    val e = graft.functions.BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(bits),
      org.apache.spark.sql.catalyst.expressions.Literal(h))
    assert(e.eval(null) === true)
  }
}
