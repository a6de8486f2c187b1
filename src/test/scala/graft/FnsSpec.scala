package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Fns

/** SURVEY.md §2.7 scalar-function semantics, incl. the Oracle-dialect
  * deltas (''≡NULL, NULL-tolerant ||, CASE-without-ELSE) and the F13
  * timestamp contract (DST-aware LA reinterpretation). */
class FnsSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  test("fullName skips null and empty parts (F2, ''≡NULL)") {
    val df = Seq(
      ("Ada", "B", "Lovelace"),
      ("Ada", null, "Lovelace"),
      ("Ada", "", "Lovelace"),
      ("  Ada  ", null, "  Lovelace ")).toDF("f", "m", "l")
    val out = df.select(Fns.fullName($"f", $"m", $"l")).as[String].collect()
    assert(out.toSeq == Seq(
      "Ada B Lovelace", "Ada Lovelace", "Ada Lovelace", "Ada Lovelace"))
  }

  test("oracleConcat treats NULL as empty string (F2)") {
    val df = Seq(("a", Option.empty[String], "c")).toDF("x", "y", "z")
    val out = df.select(Fns.oracleConcat($"x", $"y", $"z")).as[String]
      .collect()
    assert(out.head == "ac")
  }

  test("catalog parsing: prefix/root/suffix reassemble (F3/F4)") {
    val cases = Seq("C103H", "103", "A7", "9X")
    val df = cases.toDF("c")
    val out = df.select(
      concat(Fns.catalogPrefix($"c"), Fns.catalogRoot($"c"),
        Fns.catalogSuffix($"c"))).as[String].collect()
    assert(out.toSeq == cases)
  }

  test("weekdayConcat: CASE-without-ELSE pieces coalesce to '' (F6)") {
    val df = Seq(("Y", "N", "Y", "N", "Y", "N", "N")).toDF(
      "mo", "tu", "we", "th", "fr", "sa", "su")
    val out = df.select(Fns.weekdayConcat($"mo", $"tu", $"we", $"th",
      $"fr", $"sa", $"su")).as[String].collect()
    assert(out.head == "MOWEFR")
  }

  test("priorityRank maps known values, default for unknown (O2)") {
    val df = Seq("UGRD", "GRAD", "LAW", "UCBX", "??").toDF("c")
    val ranks = Seq("UGRD" -> 1, "GRAD" -> 2, "LAW" -> 3, "UCBX" -> 4)
    val out = df.select(Fns.priorityRank($"c", ranks)).as[Int].collect()
    assert(out.toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("laReinterpretFormat is DST-aware: -0800 in Jan, -0700 in Jul (F13b)") {
    val df = Seq("2024-01-15 12:00:00", "2024-07-15 12:00:00")
      .toDF("s").select(to_timestamp($"s").as("ts"))
    val out = df.select(Fns.laReinterpretFormat($"ts")).as[String].collect()
    assert(out(0) == "2024-01-15 04:00:00 -0800")
    assert(out(1) == "2024-07-15 05:00:00 -0700")
  }

  test("tsUtcFormat matches the reference serialization (F13a)") {
    val df = Seq("2024-03-01 23:59:58").toDF("s")
      .select(to_timestamp($"s").as("ts"))
    val out = df.select(Fns.tsUtcFormat($"ts")).as[String].collect()
    assert(out.head == "2024-03-01 23:59:58 UTC")
  }

  test("stripNewlines, ynToBool, nvl2, toChar, hhmm (F5/F6/F2/F7/F8)") {
    val df = Seq(("a\nb\rc", "Y", "N", 42)).toDF("t", "y", "n", "num")
      .withColumn("ts", to_timestamp(lit("2024-05-01 09:30:45")))
    val r = df.select(
      Fns.stripNewlines($"t"),
      Fns.ynToBool($"y"), Fns.ynToBool($"n"),
      Fns.nvl2($"y", lit("has"), lit("none")),
      Fns.nvl2(lit(null).cast("string"), lit("has"), lit("none")),
      Fns.toChar($"num"),
      Fns.hhmm($"ts")).head()
    assert(r.toSeq == Seq("abc", "true", "false", "has", "none",
      "42", "09:30"))
  }

  test("dailyPath: md5-dated prefix layout (S7/F12)") {
    // md5("2024-01-01") — independently computed constant
    assert(Fns.dailyPath("2024-01-01") ==
      "daily/f867f4b1ba30bf4bbed342c32b89110c-2024-01-01")
  }
}
