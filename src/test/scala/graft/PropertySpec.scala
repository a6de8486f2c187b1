package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Fns

/** §5.3 — property-based semantics checks over ScalaCheck generators.
  * Each property evaluates one Spark job over a generated batch of rows
  * (not one job per case). */
class PropertySpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private val letters = Gen.stringOf(Gen.alphaChar).map(_.take(5))
  private val digits = Gen.chooseNum(0, 99999).map(_.toString)

  test("catalog parse: prefix+root+suffix reassembles the input") {
    val cases = (for {
      p <- letters; d <- digits; s <- letters
    } yield p + d + s)
    val sample = Gen.listOfN(300, cases).sample.get
    val df = sample.toDF("c")
    val out = df.select(
      org.apache.spark.sql.functions.concat(
        Fns.catalogPrefix($"c"), Fns.catalogRoot($"c"),
        Fns.catalogSuffix($"c"))).as[String].collect()
    assert(out.toSeq == sample)
  }

  test("fullName: no double spaces, no leading/trailing space") {
    val part = Gen.oneOf(Gen.const(null: String), Gen.const(""),
      Gen.const("  "), letters, letters.map(" " + _ + " "))
    val rows = Gen.listOfN(300,
      Gen.zip(part, part, part)).sample.get
    val df = rows.toDF("f", "m", "l")
    val out = df.select(Fns.fullName($"f", $"m", $"l")).as[String]
      .collect()
    out.foreach { s =>
      assert(!s.contains("  "), s"double space in '$s'")
      assert(s == s.trim, s"untrimmed '$s'")
    }
  }

  test("BPE segmentation is lossless: tokens concatenate back to the word") {
    // for ANY word over any alphabet, the merge walk only ever glues
    // adjacent pieces — token order and content must reassemble the
    // input exactly, and the count must equal chars minus merges
    val words = Gen.listOfN(400,
      Gen.stringOfN(8, Gen.frequency(
        (8, Gen.oneOf("abcdefghijklmnopqrstuvwy".toSeq)),
        (1, Gen.oneOf("xz0!".toSeq))))).sample.get
    words.foreach { w =>
      val toks = graft.functions.BpeOps.wordTokens(w)
      assert(toks.mkString == w, s"lossy segmentation of '$w'")
      assert(toks.forall(_.nonEmpty))
      // min-rank walk == full-rank sweep on arbitrary input (the
      // sweep mirrors the oracle's unrolled replace expansion)
      assert(toks.sameElements(
        graft.functions.BpeOps.wordTokensBySweep(w)),
        s"walk/sweep divergence on '$w'")
    }
  }

  test("URL canonicalization is idempotent on adversarial variants") {
    import org.apache.spark.sql.functions.col
    import graft.operators.UrlCanon
    // generated URLs stack every normalization trigger: mixed-case
    // scheme/host, optional default + NON-default ports (the latter
    // must survive), optional path with/without trailing slash,
    // shuffled tracking + real params, optional fragment
    val gen = for {
      up <- Gen.oneOf("https", "HTTPS", "Https", "http", "HTTP")
      host <- Gen.oneOf("Example.COM", "a.example.com", "M.Site.ORG")
      // stacked default ports: one-strip-per-pass would not be a
      // fixed point (r12 review)
      port <- Gen.oneOf("", ":443", ":80", ":8443", ":80:80")
      // multi-slash tails and an EMBEDDED URL in the path (unencoded
      // redirect target — the outer host must win); '?' legal inside
      // a query per RFC 3986
      path <- Gen.oneOf("", "/x", "/x/y", "/x/", "/", "/x//",
        "/r/https://inner.example.org/p")
      // UPPERCASE and BARE (no '=') tracking keys included: both must
      // strip (r19 review — mailers emit uppercase UTM keys, bare
      // params are legal), so variants differing only in them must
      // canonicalize together (asserted below)
      params <- Gen.someOf(Seq("utm_source=a", "id=7", "gclid=z",
        "q=a?b", "utm_campaign=c", "fbclid=f", "UTM_SOURCE=mail",
        "utm_medium"))
      frag <- Gen.oneOf("", "#top", "#sec-2")
    } yield up + "://" + host + port + path +
      (if (params.isEmpty) "" else "?" + params.mkString("&")) + frag
    val urls = Gen.listOfN(400, gen).sample.get
    val once = urls.toDF("url")
      .select(UrlCanon.canonicalize(col("url")).as("c"))
      .as[String].collect().toSeq
    val twice = once.toDF("c")
      .select(UrlCanon.canonicalize(col("c")).as("c2"))
      .as[String].collect().toSeq
    assert(twice == once, "canonicalize is not a fixed point")
    // uppercase / bare tracking keys strip like the lowercase '='
    // forms: the four tracker-only variants collapse to the bare page
    val trackerVariants = Seq(
      "https://example.com/p?utm_source=mail",
      "https://example.com/p?UTM_SOURCE=mail",
      "https://example.com/p?utm_source",
      "https://example.com/p?Fbclid=x&GCLID=y")
    val canon = trackerVariants.toDF("url")
      .select(UrlCanon.canonicalize(col("url")).as("c"))
      .as[String].collect().toSet
    assert(canon == Set("https://example.com/p"),
      s"tracker variants did not collapse: $canon")
    // spot invariants: no fragment, no tracking params, no port
    // that is the SCHEME'S OWN default (scheme-aware: :80 default
    // for http only, :443 for https only), lowercase scheme+host
    // survive in every canonical form
    once.foreach { u =>
      assert(!u.contains("#") && !u.contains("utm_") &&
        !u.contains("fbclid") && !u.contains("gclid"), u)
      val host = u.drop(u.indexOf("://") + 3)
        .takeWhile(c => c != '/' && c != '?')
      if (u.startsWith("https://"))
        assert(!host.endsWith(":443"), u)
      if (u.startsWith("http://"))
        assert(!host.endsWith(":80"), u)
      assert(u.takeWhile(_ != '/').forall(c => !c.isUpper), u)
      assert(host.forall(c => !c.isUpper), u)
    }
    // non-default ports and real params must SURVIVE — including a
    // cross-scheme "default" (:443 on http is NOT a default port)
    assert(once.exists(_.contains(":8443")),
      "non-default port was stripped")
    assert(once.exists(u => u.startsWith("http://") &&
      u.dropWhile(_ != '/').takeWhile(c => c != '?').contains(":443")),
      "cross-scheme :443 on http was stripped")
    assert(once.exists(_.contains("id=7")), "real param was stripped")
  }

  test("exact dedup is idempotent: distinct twice == distinct once") {
    val rows = Gen.listOfN(500, Gen.chooseNum(0, 50)).sample.get
    val df = rows.toDF("k")
    val once = df.distinct()
    assert(once.count() == once.distinct().count())
    assert(once.count() == rows.distinct.size.toLong)
  }

  test("hammingPairs equals brute-force pairs on random fingerprints") {
    // 60 random 8-bit fingerprints; for every distance budget the
    // variant join must return exactly the brute-force ≤d pair set
    // with the exact distance
    val fps = Gen.listOfN(60, Gen.chooseNum(0L, 255L)).sample.get
      .zipWithIndex.map { case (f, i) => (i.toLong, f) }
    val df = fps.toDF("doc_id", "simhash_int")
    val byId = fps.toMap
    for (d <- 0 to 4) {
      val got = graft.operators.TextDedup
        .hammingPairs(df, bits = 8, maxDistance = d)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = (for {
        (a, fa) <- fps; (b, fb) <- fps if a < b
        dist = java.lang.Long.bitCount(fa ^ fb)
        if dist <= d
      } yield (a, b) -> dist.toLong).toMap
      assert(got == want, s"maxDistance=$d")
      // distances in the output always match the true XOR popcount
      got.foreach { case ((a, b), dist) =>
        assert(dist == java.lang.Long.bitCount(byId(a) ^ byId(b)))
      }
    }
  }

  test("repeatedSpans equals a brute-force span merge on random corpora") {
    // 3-letter alphabet, docs of 0..12 tokens, k=3: only 27 possible
    // windows, so repeats and span chains are dense — the merge logic
    // (touch/overlap vs gap) gets exercised on every draw
    val k = 3
    val doc = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c"))).map(_.mkString(" "))
    val docs = Gen.listOfN(40, doc).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val got = graft.operators.TextDedup
      .repeatedSpans(docs.toDF("doc_id", "text"), k).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // brute force over the same sample, Spark's split semantics
    val windows = docs.flatMap { case (id, t) =>
      val l = t.split(" ", -1)
      if (l.length >= k)
        (0 to l.length - k).map(i =>
          (id, i + 1, l.slice(i, i + k).mkString(" ")))
      else Seq.empty
    }
    val counts = windows.groupBy(_._3).view.mapValues(_.size).toMap
    val expect = windows.filter(w => counts(w._3) > 1).groupBy(_._1)
      .view.mapValues { ws =>
        var spans = List.empty[(Int, Int)]
        ws.map(_._2).sorted.foreach { p =>
          spans match {
            case (s, e) :: tail if p - e <= k => spans = (s, p) :: tail
            case _ => spans = (p, p) :: spans
          }
        }
        (spans.size.toLong,
          spans.map { case (s, e) => (e - s + k).toLong }.sum)
      }.toMap
    assert(got == expect, s"got $got want $expect")
  }

  test("scrubRepeatedSpans equals a brute-force treatment on random " +
      "corpora") {
    // same dense-collision regime as the repeatedSpans property; here
    // the brute force also replays the keeper ELECTION (min (doc,pos)
    // per gram) and the coverage union, so the whole treatment —
    // not just span arithmetic — is pinned
    val k = 3
    val doc = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c"))).map(_.mkString(" "))
    val docs = Gen.listOfN(40, doc).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val got = graft.operators.TextDedup
      .scrubRepeatedSpans(docs.toDF("doc_id", "text"), k).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val windows = docs.flatMap { case (id, t) =>
      val l = t.split(" ", -1)
      if (l.length >= k)
        (0 to l.length - k).map(i =>
          (id, i + 1, l.slice(i, i + k).mkString(" ")))
      else Seq.empty
    }
    val counts = windows.groupBy(_._3).view.mapValues(_.size).toMap
    val keeper = windows.groupBy(_._3).view
      .mapValues(ws => ws.map(w => (w._1, w._2)).min).toMap
    val covered = windows
      .filter(w => counts(w._3) > 1 && (w._1, w._2) != keeper(w._3))
      .groupBy(_._1).view
      .mapValues(_.flatMap(w => w._2 until w._2 + k).toSet).toMap
    val expect = docs.map { case (id, t) =>
      val l = t.split(" ", -1)
      val cov = covered.getOrElse(id, Set.empty[Int])
      val kept = (1 to l.length).filterNot(cov)
      id -> ((l.length.toLong, (l.length - kept.size).toLong,
        kept.map(i => l(i - 1)).mkString(" ")))
    }.toMap
    assert(got == expect, s"got $got want $expect")
  }

  test("greatest-per-group keeps exactly one row per key (window form)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rows = Gen.listOfN(500,
      Gen.zip(Gen.chooseNum(0, 40), Gen.chooseNum(0, 1000))).sample.get
    val df = rows.toDF("k", "v")
    val w = Window.partitionBy("k").orderBy(desc("v"), desc("k"))
    val top = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    assert(top.count() == rows.map(_._1).distinct.size.toLong)
    // and each kept v is the max for its key
    val kept = top.select("k", "v").as[(Int, Int)].collect().toMap
    rows.groupBy(_._1).foreach { case (k, vs) =>
      assert(kept(k) == vs.map(_._2).max)
    }
  }

  test("packShards: hierarchical prefix sum equals one window, any corpus") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // random (id, group, weight) rows — ids unique, groups skewed so
    // one group dominates (the scenario the two-level form exists for)
    val rows = Gen.listOfN(400, Gen.zip(
      Gen.oneOf("hot", "hot", "hot", "warm", "cold"),
      Gen.chooseNum(0L, 500L))).sample.get
      .zipWithIndex.map { case ((g, w), i) => (i.toLong, g, w) }
    val df = rows.toDF("doc_id", "source", "n_tokens")
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val ref = df.withColumn("cum", sum("n_tokens").over(w))
      .select(col("doc_id"),
        floor((col("cum") - col("n_tokens")) / 777L).as("shard"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = graft.operators.Partitioning
      .packShards(df, "source", "doc_id", "n_tokens", 777L)
      .select("doc_id", "shard")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
  }

  test("z-order skipping is sound: chunk boxes cover every rect query") {
    // the data-skipping contract: for ANY filter rectangle, scanning
    // only the chunks whose (min,max) bounding box intersects the
    // rectangle must return exactly the rows a full scan returns —
    // skipping may read too much, never too little. One Spark job
    // computes points, z-chunks, and per-chunk boxes; the rectangle
    // sweep is driver-side arithmetic over the collected boxes.
    import graft.operators.ZOrder
    import org.apache.spark.sql.functions._
    val bits = 6
    val pts = Gen.listOfN(400,
      Gen.zip(Gen.chooseNum(0L, 63L), Gen.chooseNum(0L, 63L)))
      .sample.get.distinct
    val df = pts.toDF("a", "b")
      .withColumn("chunk",
        floor(ZOrder.key2(col("a"), col("b"), bits) / 256))
    val boxes = df.groupBy("chunk")
      .agg(min("a").as("a0"), max("a").as("a1"),
        min("b").as("b0"), max("b").as("b1"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val byChunk = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._3)
    val rects = Gen.listOfN(50, Gen.zip(
      Gen.chooseNum(0L, 63L), Gen.chooseNum(0L, 63L),
      Gen.chooseNum(0L, 63L), Gen.chooseNum(0L, 63L))).sample.get
      .map { case (x0, x1, y0, y1) =>
        (math.min(x0, x1), math.max(x0, x1),
          math.min(y0, y1), math.max(y0, y1))
      }
    for ((x0, x1, y0, y1) <- rects) {
      val expected = pts.filter { case (a, b) =>
        a >= x0 && a <= x1 && b >= y0 && b <= y1 }.toSet
      val surviving = boxes.collect {
        case (c, (a0, a1, b0, b1))
            if a1 >= x0 && a0 <= x1 && b1 >= y0 && b0 <= y1 => c
      }.toSet
      val got = surviving.iterator
        .flatMap(c => byChunk.getOrElse(c, Array.empty))
        .collect { case (a, b, _)
            if a >= x0 && a <= x1 && b >= y0 && b <= y1 => (a, b) }
        .toSet
      assert(got == expected,
        s"rect ($x0..$x1, $y0..$y1): skipping lost rows")
    }
  }

  test("PII scrub is idempotent and complete on adversarial text") {
    import org.apache.spark.sql.functions._
    // generator biased toward boundary shapes: fragments that ALMOST
    // match (lone @, dotted numbers, dashed digits), full matches
    // embedded mid-token, and placeholder-like text already present
    val fragment = Gen.oneOf(
      letters, digits,
      Gen.const("a@b.co"), Gen.const("x.y@z"), Gen.const("@"),
      Gen.const("1.2.3.4"), Gen.const("10.0.0.255"), Gen.const("1.2.3"),
      Gen.const("999.999.999.999"), Gen.const("123-456-7890"),
      Gen.const("12-345-6789"), Gen.const("[EMAIL]"), Gen.const("[IP]"),
      Gen.const("user+tag@mail.example.org"), Gen.const("."),
      // mixed/upper case MUST scrub identically to lowercase (ADVICE
      // r8: lowercase-only classes silently passed Bob.Smith@Corp.COM)
      Gen.const("Bob.Smith@Corp.COM"), Gen.const("ADMIN@EXAMPLE.ORG"),
      Gen.const("MixedCase@Sub.Domain.Net"), Gen.const("X@Y"),
      Gen.const("-"), Gen.const(" "))
    val texts = Gen.listOfN(300,
      Gen.listOfN(6, fragment).map(_.mkString(" "))).sample.get
    val df = graft.operators.Pii.withScrub(texts.toDF("text"), "text")
    // completeness: no detector matches its own redaction output
    val residual = graft.operators.Pii
      .withScrub(df.select(col("clean_text").as("text")), "text")
      .agg(sum("n_emails"), sum("n_ips"), sum("n_phones")).head()
    assert((0 to 2).forall(residual.getLong(_) == 0L),
      s"redacted text still matches a detector: $residual")
    // idempotence: a second scrub is a no-op byte-for-byte
    val twice = graft.operators.Pii
      .withScrub(df.select(col("clean_text").as("text")), "text")
      .select(col("clean_text"))
    assert(twice.exceptAll(df.select(col("clean_text"))).isEmpty,
      "second scrub altered already-clean text")
    // audit-count reconciliation: counts are staged (each class sees
    // the text AFTER the prior passes), so Σ counts == placeholders
    // emitted — `1.2.3.4@corp.com` is ONE email, ZERO IPs, and a
    // phone-shaped local part is zero phones
    val staged = graft.operators.Pii.withScrub(
      Seq("reach me at 1.2.3.4@corp.com or 555-123-4567@x.com")
        .toDF("text"), "text").head()
    assert(staged.getAs[Int]("n_emails") == 2 &&
      staged.getAs[Int]("n_ips") == 0 &&
      staged.getAs[Int]("n_phones") == 0,
      s"staged counts wrong: $staged")
    assert(staged.getAs[String]("clean_text") ==
      "reach me at [EMAIL] or [EMAIL]")
    // and placeholder totals reconcile on the generated corpus too
    val recon = df.select(
      sum("n_emails").as("e"), sum("n_ips").as("i"),
      sum("n_phones").as("p"),
      sum(size(split(col("clean_text"), "\\[EMAIL\\]", -1)) - 1).as("pe"),
      sum(size(split(col("clean_text"), "\\[IP\\]", -1)) - 1).as("pi"),
      sum(size(split(col("clean_text"), "\\[PHONE\\]", -1)) - 1).as("pp"))
      .head()
    assert(recon.getLong(0) <= recon.getLong(3) &&
      recon.getLong(1) <= recon.getLong(4) &&
      recon.getLong(2) <= recon.getLong(5),
      s"audit counts exceed emitted placeholders: $recon")
  }

  test("mg_summary bound holds on arbitrary streams, any k, any layout") {
    import org.apache.spark.sql.functions._
    GraftExtensions.ensure(spark)
    // mixed-skew generator: a few celebrity keys, a long uniform tail,
    // and adversarial duplicates of the empty string
    val item = Gen.frequency(
      (5, Gen.const("celeb_a")), (3, Gen.const("celeb_b")),
      (1, Gen.const("")), (8, Gen.chooseNum(0, 400).map("t_" + _)))
    for (k <- Seq(3, 17); parts <- Seq(1, 5)) {
      val rows = Gen.listOfN(3000, item).sample.get
      val exact = rows.groupBy(identity)
        .map { case (s, v) => s -> v.size.toLong }
      val est = rows.toDF("token").repartition(parts)
        .agg(expr(s"mg_summary(token, $k)").as("mg"))
        .selectExpr("explode(mg) AS (item, e)")
        .as[(String, Long)].collect().toMap
      val slack = rows.size.toLong / (k + 1)
      assert(est.size <= k)
      (exact.keySet ++ est.keySet).foreach { it =>
        val e = est.getOrElse(it, 0L)
        val ex = exact.getOrElse(it, 0L)
        assert(e <= ex && ex - e <= slack,
          s"k=$k parts=$parts item='$it' est=$e exact=$ex slack=$slack")
      }
    }
  }

  test("skyline2d is total at Long.MinValue x (the RANGE -1 frame " +
      "bound must not overflow) and refuses scratch-column collisions") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    // x = MinValue rows, including an exact (x, y) duplicate pair that
    // must survive together: the frame bound x-1 overflows a raw long
    // under ANSI (throw) — the decimal(20,0) order column absorbs it
    val df = Seq(
      (1L, Long.MinValue, 5L), (2L, Long.MinValue, 5L),
      (3L, Long.MinValue, 9L), (4L, 0L, 9L), (5L, 10L, 20L))
      .toDF("id", "x", "y")
    val got = graft.operators.Skyline
      .skyline2d(df, "x", "y", bucket = pmod(col("id"), lit(3)))
      .select("id").as[Long].collect().toSet
    // 3 dominates 1/2 (same x, larger y); 4 is dominated by nothing
    // with smaller-or-equal x and larger y except... 3 has smaller x
    // and equal y=9 -> dominates 4; 5 survives (largest y)
    assert(got == Set(3L, 5L), s"skyline at MinValue x: $got")
    intercept[IllegalArgumentException] {
      graft.operators.Skyline.skyline2d(
        df.withColumn("__bucket", lit(1)), "x", "y", lit(1))
    }
  }

  test("skyline2d equals brute-force dominance on tie-heavy random data") {
    // coordinates in 0..6 so x-ties, y-ties and exact (x, y)
    // duplicates are all dense — the RANGE-frame strictness and the
    // duplicates-survive-together rule get exercised on every draw
    // ~1 in 8 coordinates NULL: under the pairwise oracle's
    // three-valued logic a NULL-coordinate row neither dominates nor
    // is dominated (it always survives, and never eliminates others)
    // — the staircase must reproduce that, not let nulls-first
    // ordering poison the RANGE frames
    def coord: Gen[Option[Long]] = Gen.frequency(
      7 -> Gen.chooseNum(0L, 6L).map(Some(_)),
      1 -> Gen.const(Option.empty[Long]))
    val rows = Gen.listOfN(300, Gen.zip(coord, coord))
      .sample.get.zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x, y) }
    val df = rows.map { case (i, x, y) =>
      (i, x.map(java.lang.Long.valueOf).orNull,
        y.map(java.lang.Long.valueOf).orNull)
    }.toDF("id", "x", "y")
    val got = graft.operators.Skyline
      .skyline2d(df, "x", "y",
        bucket = org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.lit(7)))
      .select("id").as[Long].collect().toSet
    val expect = rows.filter { case (_, ox, oy) =>
      // SQL three-valued dominance: any NULL operand → no dominance
      !rows.exists { case (_, obx, oby) =>
        (ox, oy, obx, oby) match {
          case (Some(x), Some(y), Some(bx), Some(by)) =>
            bx <= x && by >= y && (bx < x || by > y)
          case _ => false
        }
      }
    }.map(_._1).toSet
    assert(got == expect,
      s"missing=${expect -- got} extra=${got -- expect}")
  }

  test("decileBoundaries two-phase election equals the ntile(10) " +
      "spelling on tie-heavy random slices") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // scores in 0..5 so tie groups routinely SPAN decile boundaries —
    // the case where the boundary doc_id is an interior order
    // statistic of the tie group, not its max; sources of uneven
    // sizes (including < 10 rows) exercise the n%10 arithmetic and
    // unpopulated deciles
    val rows = Gen.listOfN(400,
      Gen.zip(Gen.oneOf("a", "b", "c", "tiny"), Gen.chooseNum(0L, 5L)))
      .sample.get.zipWithIndex
      .map { case ((s, sc), i) => (s, i.toLong, sc) }
      .filter { case (s, i, _) => s != "tiny" || i < 7 }
    val df = rows.toDF("source", "doc_id", "score")
    val got = graft.operators.QualityModel.decileBoundaries(df)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // the original per-document ntile spelling, as the oracle pins it
    val w = Window.partitionBy("source").orderBy("score", "doc_id")
    val od = df.withColumn("decile", ntile(10).over(w))
    val expect = od.groupBy("source", "decile")
      .agg(count(lit(1)).as("n_old_k"), max("score").as("b_score"))
      .join(od.withColumnRenamed("score", "b_score"),
        Seq("source", "decile", "b_score"))
      .groupBy("source", "decile", "n_old_k", "b_score")
      .agg(max("doc_id").as("b_doc"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expect,
      s"missing=${expect -- got} extra=${got -- expect}")
    // NULL scores (the kernel is the public ONE definition and
    // documents no non-null precondition): NULLs sort first like the
    // ntile spelling, and a boundary landing INSIDE the NULL group
    // must keep its decile row — the pre-r19 equi-join on b_score
    // dropped it (NULL never equi-matches), vanishing whole deciles
    val nd = ((0 until 15).map(i => ("s", i.toLong,
        null.asInstanceOf[java.lang.Long])) ++
      (15 until 20).map(i => ("s", i.toLong,
        java.lang.Long.valueOf(i.toLong))))
      .toDF("source", "doc_id", "score")
    val nb = graft.operators.QualityModel.decileBoundaries(nd)
      .collect()
    assert(nb.length == 10, s"lost deciles on NULL scores: ${nb.length}")
    assert(nb.map(_.getLong(2)).sum == 20L,
      "decile populations no longer cover the slice")
  }

  test("cdcChunks: reassembly is lossless and boundaries are local") {
    // reassembly: chunks in id order, space-joined, rebuild the text
    // exactly — for ANY doc including those shorter than the window
    // and the empty string (split('') = [''], one empty-token chunk).
    // locality: prepending tokens shifts every original boundary by
    // the prefix length but can only create/destroy boundaries whose
    // 4-gram overlaps the seam — boundary positions beyond
    // prefix+window−1 must be exactly the original ones shifted.
    val w = 4
    val prefix = List("p", "q", "r", "s", "t")
    val doc = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")))
    val bases = Gen.listOfN(30, doc).sample.get
    val docs = bases.zipWithIndex.flatMap { case (toks, i) =>
      Seq((i.toLong * 2, toks.mkString(" ")),
        (i.toLong * 2 + 1, (prefix ++ toks).mkString(" ")))
    } :+ (9999L, "")
    val ch = graft.operators.TextDedup
      .cdcChunks(docs.toDF("doc_id", "text"), window = w, mask = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toList).toMap
    docs.foreach { case (id, text) =>
      assert(ch(id).mkString(" ") == text, s"doc $id reassembly")
    }
    // boundary positions = cumulative token counts of all but the
    // last chunk (a break follows each chunk's final token)
    def bounds(chunks: List[String]): List[Int] =
      chunks.init.scanLeft(0)(_ + _.split(" ", -1).length).tail
    bases.indices.foreach { i =>
      val b0 = bounds(ch(i.toLong * 2))
      val b1 = bounds(ch(i.toLong * 2 + 1))
      // every base boundary sits at p ≥ w, so its shift lands at
      // p + |prefix| ≥ |prefix| + w — exactly the region where a
      // shifted-doc boundary's gram cannot overlap the seam
      val stable0 = b0.map(_ + prefix.length)
      val stable1 = b1.filter(_ >= prefix.length + w)
      assert(stable1 == stable0,
        s"doc $i late boundaries moved: base=$b0 shifted=$b1")
    }
  }

  test("BM25 lifecycle: build+append+remove composes to a rebuild on " +
      "any random corpus") {
    // random corpora deliberately include the edge shapes the
    // fixture pins cannot reach densely: empty texts and one-token
    // texts (no 2-shingles — the docs-with-postings nDocs
    // convention), heavy within-doc repetition (tf > 1), near-total
    // vocabulary overlap (df near N), and removals that straddle the
    // resident corpus and the appended batch
    import graft.operators.Lexical
    val word = Gen.frequency(
      (6, Gen.oneOf("alpha", "beta", "gamma", "delta")),
      (2, Gen.oneOf("epsilon", "zeta")),
      (1, Gen.const("rare")))
    val text = Gen.chooseNum(0, 8)
      .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpus = Gen.listOfN(60, text).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = corpus.toDF("doc_id", "text")
    val base = df.filter($"doc_id" % 3 =!= 0)
    val batch = df.filter($"doc_id" % 3 === 0)
    val removeIds = df.filter($"doc_id" % 5 === 1).select("doc_id")
    val composed = Lexical.removeDocs(
      Lexical.appendIndex(Lexical.buildIndex(base), batch), removeIds)
    val rebuilt = Lexical.buildIndex(df.filter($"doc_id" % 5 =!= 1))
    assert(composed.nDocs == rebuilt.nDocs &&
      composed.sumDl == rebuilt.sumDl,
      s"scalars: composed (${composed.nDocs}, ${composed.sumDl}) vs " +
        s"rebuilt (${rebuilt.nDocs}, ${rebuilt.sumDl})")
    def dfMap(d: org.apache.spark.sql.DataFrame): Map[String, Long] =
      d.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfMap(composed.df) == dfMap(rebuilt.df), "df tables differ")
    def tfMap(d: org.apache.spark.sql.DataFrame)
        : Map[(Long, String), Long] =
      d.collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(tfMap(composed.tf) == tfMap(rebuilt.tf), "postings differ")
    def dlMap(d: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dlMap(composed.dl) == dlMap(rebuilt.dl),
      "maintained dl table differs")
    // probe parity whenever the surviving corpus is probeable (the
    // dense random vocabulary may prune every term past the df cap —
    // equality still must hold, emptiness is then legitimate)
    if (rebuilt.nDocs > 0) {
      val queries = df.filter($"doc_id" % 5 =!= 1 && $"doc_id" % 7 === 0)
      def rows(d: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
        d.orderBy("q_id", "rnk").collect().map(_.toSeq).toSeq
      assert(rows(Lexical.rankedFromIndex(composed, queries)) ==
        rows(Lexical.rankedFromIndex(rebuilt, queries)),
        "probe rankings diverged")
    }
  }
}
