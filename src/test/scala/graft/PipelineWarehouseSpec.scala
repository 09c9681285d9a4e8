package graft

import graft.analytics.WarehouseQueries
import graft.ext.PipelineQueries
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the training-data assembly (XP1–XP4) and warehouse
  * maintenance (M1–M3) operators, beyond the hash gate: structural
  * invariants a hash can't articulate (packing bounds, minimal repeat
  * factors, scrub completeness, ntile balance, interval disjointness,
  * merge action partitioning).
  */
class PipelineWarehouseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  test("XP1 packing: bins are contiguous per stream and fill stays bounded") {
    val bins = PipelineQueries.packSequences(spark, sf).collect()
    assert(bins.nonEmpty)
    // per (lang, source) stream: bin ids start at 0 and are contiguous
    bins.groupBy(r => (r.getString(0), r.getString(1))).foreach {
      case (_, rs) =>
        val ids = rs.map(_.getLong(2)).sorted
        assert(ids.head == 0L && ids.zipWithIndex.forall { case (b, i) => b == i })
    }
    // a doc starts in the bin its prefix lands in, so a bin can only
    // exceed the budget by carry-over from docs that started inside it:
    // every bin except the stream's last must have reached the budget
    // (otherwise the next doc would have landed in it).
    bins.groupBy(r => (r.getString(0), r.getString(1))).foreach {
      case (_, rs) =>
        val byBin = rs.sortBy(_.getLong(2))
        byBin.dropRight(1).foreach { r =>
          val cumThrough = byBin.takeWhile(_.getLong(2) <= r.getLong(2))
            .map(_.getLong(4)).sum
          assert(cumThrough >= 256L * (r.getLong(2) + 1),
            s"non-final bin under budget: $r")
        }
    }
  }

  test("XP1b exact-token packing: bins budget the trained vocab's real counts") {
    val bins = PipelineQueries.packExactTokens(spark, sf).collect()
    assert(bins.nonEmpty)
    // the fill-rate column is checked AGAINST THE VOCAB: per stream, the
    // packed token mass must equal the sum of q_tokens_per_doc's exact
    // per-doc counts — a packer still budgeting the \S{1,4} estimate
    // cannot reconcile (the estimate over-counts multi-merge words)
    val exact = graft.ext.TextQueries.tokensPerDoc(spark, sf)
      .join(graft.Tables.documents(spark, sf).select(col("doc_id"),
        col("lang"), col("source")), "doc_id")
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("n_tokens")).as("t"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val packed = bins.groupBy(r => (r.getString(0), r.getString(1))).map {
      case (k, rs) => k -> (rs.map(_.getLong(4)).sum, rs.map(_.getLong(3)).sum)
    }
    assert(packed == exact,
      "packed token mass diverged from the trained vocab's exact counts")
    // full structural pin: a local brute-force replay of the contiguous
    // fill over the exact per-doc counts reproduces every bin row.
    // (UNLIKE the estimate packer, bin ids may legitimately skip — a doc
    // whose exact count exceeds the budget consumes multiple bins' worth
    // of prefix — so the pin is row-set equality, not contiguity.)
    val perDoc = graft.ext.TextQueries.tokensPerDoc(spark, sf)
      .join(graft.Tables.documents(spark, sf).select(col("doc_id"),
        col("lang"), col("source")), "doc_id")
      .select(col("lang"), col("source"), col("doc_id"), col("n_tokens"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = perDoc.groupBy(d => (d._1, d._2)).flatMap { case ((l, s), ds) =>
      var cum = 0L
      ds.sortBy(_._3).map { d =>
        val bin = cum / 256; cum += d._4; (l, s, bin, d._4)
      }.groupBy(_._3).map { case (bin, xs) =>
        val t = xs.map(_._4).sum
        (l, s, bin, xs.length.toLong, t, t * 10000 / 256)
      }
    }.toSet
    val got = bins.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == expected, "bin rows diverged from the local replay")
  }

  test("XP1c manifest: bin composition reconciles with the census, offsets valid") {
    val man = PipelineQueries.packManifest(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(man.nonEmpty)
    // a doc STARTS inside its bin: offset within [0, budget)
    man.foreach(m => assert(m._7 >= 0 && m._7 < 256L, s"offset out of range: $m"))
    man.groupBy(m => (m._1, m._2, m._3)).foreach { case (k, rows) =>
      // seq_pos dense from 1 in doc_id order
      val sorted = rows.sortBy(_._5)
      assert(sorted.map(_._4).toSeq === (1L to rows.length.toLong), s"ranks not dense at $k")
      // offsets replay: each doc starts where the previous mass left off
      // (mod budget), within the stream's running total
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(b._7 === (a._7 + a._6) % 256L ||
          (a._7 + a._6) >= 256L, // a bin-overflowing doc resets the offset chain
          s"offset chain broken between $a and $b")
      }
    }
    // reconciliation: the manifest's per-bin doc count and token mass ARE
    // the census's n_docs / bin_tokens
    val census = PipelineQueries.packExactTokens(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    val manAgg = man.groupBy(m => (m._1, m._2, m._3)).view
      .mapValues(rows => (rows.length.toLong, rows.map(_._6).sum)).toMap
    assert(manAgg == census, "manifest diverged from the bin census")
  }

  test("XP22 resume: frontier coordinates reconcile with the manifest") {
    val manifest = PipelineQueries.packManifest(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getLong(4)),
        (r.getLong(2), r.getLong(3), r.getLong(5), r.getLong(6))))
      .toMap // (lang, source, doc_id) -> (bin, seq_pos, n_tok, start_off)
    val out = PipelineQueries.resumePosition(spark, sf).collect()
    assert(out.nonEmpty)
    val streams = manifest.keys.map(k => (k._1, k._2)).toSet
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet === streams)
    out.foreach { r =>
      val (lang, source) = (r.getString(0), r.getString(1))
      val ckpt = r.getAs[Long]("ckpt_tokens")
      val docs = manifest.collect { case ((l, s, id), v) if l == lang && s == source => id -> v }
      val total = docs.map(_._2._3).sum
      assert(ckpt === total / 3)
      val (bin, seqPos, nTok, startOff) = docs.toMap.apply(r.getAs[Long]("resume_doc_id"))
      assert(r.getAs[Long]("resume_bin") === bin)
      assert(r.getAs[Long]("resume_seq_pos") === seqPos)
      assert(r.getAs[Long]("resume_start_off") === startOff)
      // the frontier doc straddles the checkpoint: consumed before it,
      // not past it; mid-doc offset lands inside the doc
      val off = r.getAs[Long]("within_doc_off")
      assert(off >= 0 && off < nTok)
      assert(r.getAs[Long]("skip_docs") ===
        docs.count(_._1 < r.getAs[Long]("resume_doc_id")).toLong)
    }
  }

  test("XP23 cross-doc attention: closed forms == brute token-level replay") {
    val B = 256L // PACK_BUDGET
    val W = 64L  // ATTN_WINDOW
    // brute replay: lay every stream's tokens out in packed order and,
    // for EACH token, count its attended window and the slice of it that
    // falls before its document's segment start in that bin
    val docs = graft.Tables.documents(spark, sf)
      .select(col("lang"), col("source"), col("doc_id"), col("text"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        """\S{1,4}""".r.findAllIn(r.getString(3)).size.toLong))
    val brute = docs.groupBy(d => (d._1, d._2)).map { case (key, ds) =>
      var cum = 0L
      var attn = 0L
      var cross = 0L
      var docsCrossing = 0L
      var maxDocCross = 0L
      ds.sortBy(_._3).foreach { case (_, _, _, n) =>
        val d0 = cum
        var docCross = 0L
        var j = 0L
        while (j < n) {
          val g = d0 + j
          val q = g % B
          val att = math.min(W, q)
          attn += att
          val segStart = math.max(0L, d0 - (g / B) * B)
          docCross += math.max(0L, segStart - (q - att))
          j += 1
        }
        cross += docCross
        if (docCross > 0) docsCrossing += 1
        maxDocCross = math.max(maxDocCross, docCross)
        cum += n
      }
      val bp = if (attn > 0) cross * 10000 / attn else 0L
      key -> (ds.length.toLong, attn, cross, bp, docsCrossing, maxDocCross)
    }
    val out = PipelineQueries.packCrossDoc(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    assert(out.keySet === brute.keySet)
    brute.foreach { case (k, v) =>
      assert(out(k) === v, s"stream $k: closed form diverged from brute")
    }
    // the audit must actually be discriminative on this corpus: packing
    // without doc masking leaks somewhere, but never 100%
    assert(out.values.exists(_._3 > 0L))
    out.values.foreach { case (_, attn, cross, bp, _, _) =>
      assert(cross <= attn && bp < 10000L)
    }
  }

  test("XP24 epoch budget: waterfill replay + budget/cap invariants") {
    val out = PipelineQueries.epochBudget(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7), r.getLong(8)))
    assert(out.nonEmpty)
    // replay the two-round capped waterfill from the emitted
    // (tokens, q_permille) — the allocation math must reproduce exactly
    val budget = out.map(_._3).sum * 4L
    val ws = out.map(r => r._3 * r._4)
    val sumW = ws.sum
    val caps = out.map(_._3 * 4L)
    val a1 = ws.zip(caps).map { case (w, cap) =>
      math.min(if (sumW > 0) budget * w / sumW else 0L, cap)
    }
    val sumA1 = a1.sum
    val sumWOpen = ws.zip(a1).zip(caps).collect {
      case ((w, a), cap) if a < cap => w
    }.sum
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r._5 === caps(i))
      assert(r._6 === a1(i), s"alloc1 diverged for ${(r._1, r._2)}")
      val a2 = if (a1(i) < caps(i) && sumWOpen > 0)
        math.min((budget - sumA1) * ws(i) / sumWOpen, caps(i) - a1(i))
      else 0L
      assert(r._7 === a1(i) + a2, s"final diverged for ${(r._1, r._2)}")
      assert(r._8 === (if (r._3 > 0) r._7 * 1000000L / r._3 else 0L))
      assert(r._9 === (if (r._7 >= caps(i)) 1L else 0L))
      // never over the repeat ceiling
      assert(r._7 <= caps(i) && r._8 <= 4000000L)
    }
    // never over the global budget; the re-offer round spends monotonically
    assert(out.map(_._7).sum <= budget)
    assert(out.map(_._7).sum >= a1.sum)
    // the planner is genuinely data-constrained at this corpus: caps bind
    // for most streams AND the re-offer round moves real budget
    assert(out.count(_._9 == 1L) * 2 > out.length)
    assert(out.map(_._7).sum - a1.sum > out.length)
  }

  test("XP25 readiness report: reconciles with XP14 census + waterfill replay") {
    val out = PipelineQueries.trainReadiness(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8))).toMap
    assert(out.nonEmpty)
    // stage populations must be the XP14 pipeline's own (same gate, same
    // dedup rule, same exact-token packing — both independently gated)
    val xp14 = PipelineQueries.pipelineCorpus(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out.keySet === xp14.keySet)
    out.foreach { case (k, (nDocs, nKept, tokens, nBins, _, _, _)) =>
      val (d14, k14, t14, b14) = xp14(k)
      assert(nDocs === d14 && nKept === k14, s"census diverged at $k")
      assert(tokens === t14 && nBins === b14, s"packing diverged at $k")
    }
    // the epoch plan replays from the report's own (tokens, survival)
    val budget = out.values.map(_._3).sum * 4L
    val rows = out.toSeq.sortBy(_._1)
    val ws = rows.map { case (_, v) => v._3 * (1 + v._2 * 999 / v._1) }
    val caps = rows.map(_._2._3 * 4L)
    val sumW = ws.sum
    val a1 = ws.zip(caps).map { case (w, c) =>
      math.min(if (sumW > 0) budget * w / sumW else 0L, c)
    }
    val sumA1 = a1.sum
    val wOpen = ws.zip(a1).zip(caps).collect {
      case ((w, a), c) if a < c => w
    }.sum
    rows.zipWithIndex.foreach { case ((k, v), i) =>
      val a2 = if (a1(i) < caps(i) && wOpen > 0)
        math.min((budget - sumA1) * ws(i) / wOpen, caps(i) - a1(i)) else 0L
      val fin = a1(i) + a2
      val micro = if (v._3 > 0) fin * 1000000L / v._3 else 0L
      assert(v._6 === micro, s"epoch plan diverged at $k")
      assert(v._7 === (if (fin >= caps(i) && v._3 > 0) 1L else 0L))
    }
    // the report is load-bearing on this corpus: caps bind somewhere and
    // the packed layout leaks somewhere
    assert(out.values.exists(_._7 == 1L))
    assert(out.values.exists(_._5 > 0L))
  }

  test("W5b U-touch attribution: brute replay + exact credit conservation") {
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("ts_us"), col("event_id"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val week = 7L * 24 * 3600 * 1000000L
    val byUser = evs.groupBy(_._1)
    val acc = scala.collection.mutable.Map
      .empty[String, (Long, Long, Long)].withDefaultValue((0L, 0L, 0L))
    var purchases = 0L
    byUser.values.foreach { rows =>
      val touches = rows.filter(_._2 != "purchase")
      rows.filter(_._2 == "purchase").foreach { case (_, _, pTs, _, cents) =>
        purchases += 1
        val in = touches.filter(t => t._3 < pTs && t._3 >= pTs - week)
          .sortBy(t => (t._3, t._4))
        val n = in.length
        val credits: Seq[(String, Long)] =
          if (n == 0) Seq("none" -> 10000L)
          else if (n == 1) Seq(in(0)._2 -> 10000L)
          else if (n == 2) Seq(in(0)._2 -> 5000L, in(1)._2 -> 5000L)
          else {
            val m = n - 2
            (in(0)._2 -> (4000L + 2000L % m)) +:
              in.slice(1, n - 1).map(t => t._2 -> (2000L / m)) :+
              (in(n - 1)._2 -> 4000L)
          }
        assert(credits.map(_._2).sum === 10000L) // conservation per purchase
        credits.foreach { case (ty, bp) =>
          val (c, b, v) = acc(ty)
          acc(ty) = (c + 1, b + bp, v + cents * bp / 10000)
        }
      }
    }
    val out = graft.analytics.IncrementalQueries
      .attributionUTouch(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out === acc.toMap, "U-touch census diverged from brute replay")
    assert(out.values.map(_._2).sum === purchases * 10000L,
      "credit mass not conserved across the census")
  }

  test("XP14 corpus assembly: stages compose — local replay of gate, dedup, pack") {
    val out = PipelineQueries.pipelineCorpus(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    assert(out.nonEmpty)
    // stage monotonicity + internal consistency per stream
    out.values.foreach { case (nd, nq, nk, _, nb, nf) =>
      assert(nd >= nq && nq >= nk)
      assert(nf <= nb)
    }
    // local replay: quality gate + min-doc_id-per-md5 keep decides the
    // survivor set; the packed token mass must equal the exact counts of
    // EXACTLY those survivors (a pipeline packing pre-dedup or pre-gate
    // docs cannot reconcile)
    val gated = graft.Tables.documents(spark, sf)
      .filter(graft.ext.TextQueries.qualityCol)
      .select(col("doc_id"), col("lang"), col("source"), md5(col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
    val keep = gated.groupBy(_._4).values.map(_.minBy(_._1)._1).toSet
    val exact = graft.ext.TextQueries.tokensPerDoc(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    val expTokens = gated.filter(d => keep(d._1))
      .groupBy(d => (d._2, d._3)).view
      .mapValues(_.map(d => exact.getOrElse(d._1, 0L)).sum).toMap
    out.foreach { case (k, (_, _, _, tot, _, _)) =>
      assert(tot == expTokens.getOrElse(k, 0L),
        s"stream $k packed mass diverged from the survivor replay")
    }
  }

  test("XP2 mixing: repeat factors are minimal and copies are dense") {
    val out = PipelineQueries.mixWeighted(spark, sf).collect()
    val perLangTok = out.groupBy(_.getString(0)).map { case (l, rs) =>
      // each doc appears r times with copies 1..r
      val byDoc = rs.groupBy(_.getLong(1))
      val rFactors = byDoc.values.map { copies =>
        val idx = copies.map(_.getLong(3)).sorted
        assert(idx.toSeq == (1L to idx.size.toLong), "copy indices not dense")
        idx.size
      }.toSet
      assert(rFactors.size == 1, s"lang $l has mixed repeat factors")
      val baseToks = byDoc.values.map(_.head.getLong(2)).sum
      (l, baseToks, rFactors.head)
    }
    val tMax = perLangTok.map(_._2).max
    perLangTok.foreach { case (l, t, r) =>
      assert(r * t >= tMax, s"$l under-replicated")
      assert((r - 1) * t < tMax, s"$l over-replicated (r not minimal)")
    }
  }

  test("XP3 scrub: no denylisted token survives, volumes reconcile") {
    import spark.implicits._
    val deny = Set("the", "of", "and", "to", "a", "in", "is",
      "der", "die", "und", "el", "la", "de", "le", "et", "les")
    val docs = Tables.documents(spark, sf)
      .select($"text").as[String].collect()
    val expectedRemoved = docs.map(_.split(" ").count(deny)).sum.toLong
    val agg = PipelineQueries.scrubDenylist(spark, sf)
      .agg(sum($"toks_removed"), sum($"toks_before")).head()
    assert(agg.getLong(0) == expectedRemoved)
    assert(agg.getLong(1) == docs.map(_.split(" ").length).sum.toLong)
  }

  test("XP4 ntile: quartile populations per language differ by at most 1") {
    val rows = PipelineQueries.qualityNtile(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length.toLong),
        s"$lang quartiles not dense")
      val counts = rs.map(_.getLong(2))
      assert(counts.max - counts.min <= 1, s"$lang unbalanced: ${counts.toSeq}")
      // score ranges are non-overlapping and ordered with the quartile
      val ordered = rs.sortBy(_.getLong(1))
      ordered.sliding(2).foreach {
        case Array(lo, hi) => assert(lo.getLong(4) <= hi.getLong(3))
        case _ => ()
      }
    }
  }

  test("XP5 chunking: chunks cover every char with the declared overlap") {
    import spark.implicits._
    val lens = Tables.documents(spark, sf)
      .select($"doc_id", length($"text").cast("long")).as[(Long, Long)]
      .collect().toMap
    val chunks = PipelineQueries.chunkDocuments(spark, sf).collect()
    chunks.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_.getLong(2))
      val len = lens(doc)
      // dense indices from 0; starts stride apart; tail chunk reaches EOF
      assert(sorted.map(_.getLong(2)).toSeq == (0L until sorted.length.toLong))
      sorted.foreach { r =>
        assert(r.getLong(3) == r.getLong(2) * 150 + 1)
        assert(r.getLong(4) == math.min(200L, len - r.getLong(2) * 150))
      }
      val last = sorted.last
      assert(last.getLong(3) + last.getLong(4) - 1 == len, s"doc $doc tail gap")
      // every non-final chunk is full-size => 50-char overlap with the next
      sorted.dropRight(1).foreach(r => assert(r.getLong(4) == 200L))
    }
  }

  test("M1 SCD2: intervals tile each user's timeline exactly") {
    import spark.implicits._
    // rebuild intervals locally from the raw stream and compare aggregates
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_type", unix_micros($"ts").as("ts_us"),
        $"event_id")
      .as[(Long, String, Long, Long)].collect()
    var nIntervals = 0L; var nCurrent = 0L; var closed = 0L
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._4))
      val changes = sorted.foldLeft(Vector.empty[(String, Long)]) {
        case (acc, (_, et, ts, _)) =>
          if (acc.nonEmpty && acc.last._1 == et) acc else acc :+ (et -> ts)
      }
      nIntervals += changes.size
      nCurrent += 1
      changes.sliding(2).foreach {
        case Vector((_, from), (_, to)) => closed += to - from
        case _ => ()
      }
    }
    val agg = WarehouseQueries.scd2Intervals(spark, sf)
      .agg(sum($"n_intervals"), sum($"n_current"), sum($"closed_dur_us")).head()
    assert(agg.getLong(0) == nIntervals)
    assert(agg.getLong(1) == nCurrent)   // exactly one open interval per user
    assert(agg.getLong(2) == closed)     // closed intervals tile the timeline
  }

  test("M6 PIT join: every purchase attributed to the state at its time") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_type", unix_micros($"ts").as("ts_us"),
        $"event_id")
      .as[(Long, String, Long, Long)].collect()
    // brute force: for each purchase, the state is the event_type of the
    // latest PRECEDING (ts, event_id) non-purchase change row of that user
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._4))
      val purchases = sorted.filter(_._2 == "purchase")
      purchases.map { p =>
        val prior = sorted.filter(r =>
          r._2 != "purchase" &&
            (r._3 < p._3 || (r._3 == p._3 && r._4 < p._4)))
        if (prior.isEmpty) "none" else prior.last._2
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = WarehouseQueries.scd2AsOf(spark, sf).collect()
      .map(r => r.getAs[String]("state_at_purchase") ->
        r.getAs[Long]("n_purchases")).toMap
    assert(got === expected)
    assert(got.values.sum === ev.count(_._2 == "purchase").toLong)
  }

  test("S13 schema evolution: v1 rows land in 'unknown', totals reconcile") {
    import spark.implicits._
    val rows = WarehouseQueries.schemaEvolution(spark, sf).collect()
    val orders = Tables.orders(spark, sf)
    val cutoff = lit("1996-01-01").cast("timestamp")
    val v1 = orders.filter($"o_orderdate" < cutoff).count()
    val unknown = rows.find(_.getAs[String]("priority") == "unknown")
    assert(unknown.exists(_.getAs[Long]("n_orders") === v1))
    assert(rows.map(_.getAs[Long]("n_orders")).sum === orders.count())
  }

  test("M2 merge: actions partition base+delta keyspace with exact counts") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf)
      .select($"o_orderkey").as[Long].collect()
    val nUpd = orders.count(_ % 7 == 0).toLong
    val nIns = orders.count(_ % 13 == 0).toLong
    val byAction = WarehouseQueries.mergeUpsert(spark, sf).collect()
      .groupBy(_.getString(1)).map { case (a, rs) =>
        a -> rs.map(_.getLong(2)).sum
      }
    assert(byAction("update") == nUpd)
    assert(byAction("insert") == nIns)
    assert(byAction("unchanged") == orders.length - nUpd)
    assert(byAction.values.sum == orders.length + nIns)
  }

  test("XP11 ensemble census: cells partition the corpus, flags are 0/1") {
    import spark.implicits._
    val rows = graft.ext.PipelineQueries.qualityEnsemble(spark, sf).collect()
    val perLang = rows.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val truth = Tables.documents(spark, sf).groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang === truth)
    rows.foreach { r =>
      Seq("q_rule", "q_ent", "q_lm").foreach(c =>
        assert(r.getAs[Long](c) == 0L || r.getAs[Long](c) == 1L))
    }
  }

  test("M7 CDC apply: tombstones erase, late U reinstates, counts reconcile") {
    import spark.implicits._
    val keys = Tables.orders(spark, sf)
      .select($"o_orderkey").as[Long].collect()
    // local latest-op-wins replay per key
    val erased = keys.count(k => k % 11 == 0 && k % 55 != 0).toLong
    val inserted = keys.count(_ % 17 == 0).toLong
    val cdcWritten = // keys whose compacted last op is U or I (not base)
      keys.count(k => k % 55 == 0 || (k % 5 == 0 && k % 11 != 0)).toLong +
        inserted
    val rows = WarehouseQueries.cdcApply(spark, sf).collect()
    val bySrc = rows.groupBy(_.getString(1)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySrc("base") + bySrc("cdc") ===
      keys.length - erased + inserted)
    assert(bySrc("cdc") === cdcWritten)
  }

  test("M4 incremental: merged partials equal the one-shot aggregation") {
    import spark.implicits._
    val oneShot = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"),
        min($"value".cast("decimal(18,2)")).cast("double").as("min_value"),
        max($"value".cast("decimal(18,2)")).cast("double").as("max_value"))
      .orderBy($"event_type").collect()
    val merged = graft.analytics.IncrementalQueries
      .incrementalAgg(spark, sf).collect()
    assert(merged.toSeq == oneShot.toSeq)
  }

  test("W5 attribution: every purchase is attributed exactly once") {
    import spark.implicits._
    val out = graft.analytics.IncrementalQueries.attribution(spark, sf)
    val attributed = out.agg(sum($"n_purchases")).head().getLong(0)
    val purchases = Tables.events(spark, sf)
      .where($"event_type" === "purchase").count()
    assert(attributed == purchases)
    // last_touch can never be 'none' while first_touch is set: if any
    // prior touch exists, both windows see it
    assert(out.where($"last_touch" === "none" && $"first_touch" =!= "none")
      .count() == 0)
  }

  test("X2e fuzzy join: blocked pairs match brute force over the dictionary") {
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Tables.part(spark, sf)
      .select($"p_name").distinct().as[String].collect().sorted
    val brute = (for {
      a <- names; b <- names
      if a < b && a.head == b.head && math.abs(a.length - b.length) <= 3
      d = lev(a, b) if d <= 3
    } yield (a, b, d.toLong)).toSet
    val got = graft.ext.FuzzyQueries.fuzzyNameJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == brute)
    assert(got.nonEmpty) // the check is vacuous on an empty pair set
  }

  test("XP13 span scrub: census equals a local brute-force scrub") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text").as[(Long, String, String)]
      .collect()
    // brute reimplementation of the declared semantics: 3-word
    // non-overlapping spans, hot = present in >= 3 distinct docs,
    // reassemble survivors + tail in position order
    val W = 3
    val perDoc = docs.map { case (id, src, text) =>
      val w = text.split(" ", -1)
      val n = w.length / W
      val spans = (0 until n).map(i => w.slice(i * W, i * W + W).mkString(" "))
      val tail = w.drop(n * W).mkString(" ")
      (id, src, spans, tail)
    }
    val hot = perDoc.flatMap { case (id, _, spans, _) => spans.distinct.map(_ -> id) }
      .groupBy(_._1).filter(_._2.length >= 3).keySet
    val scrubbed = perDoc.map { case (id, src, spans, tail) =>
      val kept = spans.filterNot(hot)
      val txt = Seq(kept.mkString(" "), tail).filter(_.nonEmpty).mkString(" ")
      (src, spans.length.toLong, kept.length.toLong, txt)
    }
    def chk(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 1000000007L
    }
    val expect = scrubbed.groupBy(_._1).map { case (src, rs) =>
      Row(src, rs.length.toLong, rs.map(_._2).sum, rs.map(r => r._2 - r._3).sum,
        rs.count(r => r._2 > r._3).toLong, rs.map(_._4.length.toLong).sum,
        rs.map(r => chk(r._4)).sum)
    }.toSeq.sortBy(_.getString(0))
    val got = PipelineQueries.spanScrub(spark, sf).collect().toSeq
    assert(got == expect)
    // the operator must actually remove something at this scale
    assert(got.map(_.getLong(3)).sum > 0)
  }

  test("XP13 hot-set cap: top-K by distinct-doc count, ties by span text") {
    import spark.implicits._
    // aa in 5 docs, bb in 4, cc+dd tie at 3, ee below the bar at 2;
    // within-doc duplicates must not inflate the distinct-doc count
    val spansDf = Seq(
      Seq("aa", "bb", "cc", "dd", "aa"),
      Seq("aa", "bb", "cc", "ee"),
      Seq("aa", "bb", "cc", "dd"),
      Seq("aa", "bb", "dd", "ee"),
      Seq("aa")
    ).toDF("spans")
    def hot(k: Int): Seq[String] =
      PipelineQueries.hotSpans(spansDf, 3, k)
        .collect().head.getSeq[String](0)
    assert(hot(10) === Seq("aa", "bb", "cc", "dd")) // cap above: all qualify
    assert(hot(3) === Seq("aa", "bb", "cc")) // cc beats dd on the nd=3 tie
    assert(hot(2) === Seq("aa", "bb")) // strict nd order
    assert(hot(1) === Seq("aa"))
    // the bar itself still applies under a generous cap
    assert(!hot(10).contains("ee"))
  }

  test("M9 incremental join: every IVM term is non-vacuous at this scale") {
    import spark.implicits._
    // the oracle pins merged == one-shot; what it cannot see is whether
    // the cutoffs actually split both sides (a degenerate split would
    // make the identity trivially true with three empty terms)
    val o = Tables.orders(spark, sf)
    val l = Tables.lineitem(spark, sf)
    val oCut = "1998-01-01"
    val lCut = "1999-01-01"
    assert(o.filter($"o_orderdate" < lit(oCut).cast("timestamp")).count() > 0)
    assert(o.filter($"o_orderdate" >= lit(oCut).cast("timestamp")).count() > 0)
    assert(l.filter($"l_shipdate" < lit(lCut).cast("timestamp")).count() > 0)
    assert(l.filter($"l_shipdate" >= lit(lCut).cast("timestamp")).count() > 0)
    // and each join term individually contributes rows
    def n(odlt: Boolean, ldlt: Boolean): Long = {
      val oo = if (odlt) o.filter($"o_orderdate" >= lit(oCut).cast("timestamp"))
        else o.filter($"o_orderdate" < lit(oCut).cast("timestamp"))
      val ll = if (ldlt) l.filter($"l_shipdate" >= lit(lCut).cast("timestamp"))
        else l.filter($"l_shipdate" < lit(lCut).cast("timestamp"))
      oo.join(ll, $"o_orderkey" === $"l_orderkey").count()
    }
    val terms = Seq(n(false, false), n(true, false), n(false, true), n(true, true))
    assert(terms.forall(_ > 0), s"vacuous IVM term(s): $terms")
    val direct = o.join(l, $"o_orderkey" === $"l_orderkey").count()
    assert(terms.sum === direct)
  }

  test("M8 format round-trip: ORC and CSV read back content-equal to parquet") {
    import spark.implicits._
    val rows = WarehouseQueries.formatRoundtrip(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("csv", "orc", "parquet"))
    val metrics = rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
      r.getString(4), r.getString(5))).distinct
    assert(metrics.length === 1,
      s"formats disagree after round-trip: ${rows.mkString(", ")}")
    val direct = Tables.lineitem(spark, sf)
      .filter($"l_returnflag" === "R").count()
    assert(metrics.head._1 === direct)
  }

  test("XP20 temperature mix: equals a local replay; sqrt law compresses") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"lang", $"text").as[(String, String)].collect()
    def nTok(t: String): Long = "\\S{1,4}".r.findAllIn(t).size.toLong
    val counts = docs.groupBy(_._1).view
      .mapValues(_.map(d => nTok(d._2)).sum).toMap
    val tn = counts.values.sum
    val wq = counts.view.mapValues(n =>
      math.round(math.sqrt(n.toDouble) * 10000)).toMap
    val tw = wq.values.sum
    val got = PipelineQueries.mixTemperature(spark, sf).collect()
    assert(got.length === counts.size)
    got.foreach { r =>
      val l = r.getString(0)
      assert(r.getLong(1) === counts(l))
      assert(r.getLong(2) === counts(l) * 10000 / tn)
      assert(r.getLong(3) === wq(l) * 10000 / tw)
      assert(r.getLong(4) === r.getLong(3) - r.getLong(2))
    }
    // the sqrt law must compress the mix: the largest language loses
    // share, the smallest gains (strictly, unless already uniform)
    val byN = got.sortBy(_.getLong(1))
    if (byN.head.getLong(1) != byN.last.getLong(1)) {
      assert(byN.head.getLong(4) > 0L, "smallest language not boosted")
      assert(byN.last.getLong(4) < 0L, "largest language not damped")
    }
    // shares are a floor-partition of 10000
    val s = got.map(_.getLong(3)).sum
    assert(s <= 10000L && s > 10000L - got.length)
  }

  test("XP18 padding audit: equals a brute replay of both batching arms") {
    import spark.implicits._
    val B = 8
    val docs = Tables.documents(spark, sf)
      .select($"lang", $"doc_id", $"text").as[(String, Long, String)]
      .collect()
    def nTok(t: String): Long = "\\S{1,4}".r.findAllIn(t).size.toLong
    val toks = docs.map { case (l, id, t) => (l, id, nTok(t)) }
    def padded(ordered: Seq[Long]): Long =
      ordered.grouped(B).map(g => g.size.toLong * g.max).sum
    val expect = toks.groupBy(_._1).map { case (lang, rs) =>
      val naive = padded(rs.sortBy(_._2).map(_._3))
      val bucket = padded(rs.sortBy(r => (r._3, r._2)).map(_._3))
      lang -> (rs.size.toLong, rs.map(_._3).sum, naive, bucket,
        (naive - bucket) * 10000 / naive)
    }
    val got = PipelineQueries.packPadding(spark, sf).collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      val (nDocs, tokSum, naive, bucket, savedBp) = expect(r.getString(0))
      assert(r.getLong(1) === nDocs)
      assert(r.getLong(2) === tokSum)
      assert(r.getLong(3) === naive)
      assert(r.getLong(4) === bucket)
      assert(r.getLong(5) === savedBp)
      // bucketing can never cost more than arrival order, and padded cost
      // is bounded below by the true token mass
      assert(bucket <= naive)
      assert(bucket >= tokSum)
    }
  }

  test("XP15 mix sample: audit equals a local greedy-prefix replay") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"source", $"doc_id", $"text").as[(String, Long, String)]
      .collect()
    def nTok(t: String): Long = "\\S{1,4}".r.findAllIn(t).size.toLong
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val toks = docs.map { case (src, id, t) => (src, id, nTok(t)) }
    val total = toks.map(_._3).sum
    val bGlobal = total / 3
    def wOf(src: String) = 1L + src.drop(3).toLong % 4L
    val sumW = toks.map(_._1).distinct.map(wOf).sum
    val expect = toks.groupBy(_._1).map { case (src, rs) =>
      val budget = bGlobal * wOf(src) / sumW
      val ranked = rs.sortBy { case (_, id, _) => (md5hex(s"mix_$id"), id) }
      var cum = 0L; var kept = 0L; var keptToks = 0L
      ranked.foreach { case (_, _, n) =>
        if (cum < budget) { kept += 1; keptToks += n }
        cum += n
      }
      src -> (wOf(src), budget, kept, keptToks, keptToks - budget)
    }
    val got = PipelineQueries.mixSample(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (w, b, k, kt, d) = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) == ((w, b, k, kt, d)), s"row diverged: $r")
    }
    // every funded domain keeps >= 1 doc; positive overshoot is bounded
    // by ONE document (the doc that crossed the budget)
    got.filter(_.getLong(2) > 0).foreach { r =>
      assert(r.getLong(3) >= 1L, s"funded domain kept nothing: $r")
    }
    val maxDoc = toks.map(_._3).max
    got.foreach { r =>
      assert(r.getLong(5) <= maxDoc, s"overshoot exceeds one doc: $r")
    }
    // the sampler actually cuts: total kept tokens well under the corpus
    assert(got.map(_.getLong(4)).sum < total)
  }

  test("XP16 pack shuffle: each epoch is a distinct bijection over the bins") {
    val rows = PipelineQueries.packShuffle(spark, sf).collect()
    val byEpoch = rows.groupBy(_.getString(0))
    assert(byEpoch.keySet == Set("ep0", "ep1"))
    // same bin set in both epochs, each exactly once, dense positions
    val binSets = byEpoch.view.mapValues(_.map(r =>
      (r.getString(2), r.getString(3), r.getLong(4))).toSet).toMap
    assert(binSets("ep0") == binSets("ep1"))
    byEpoch.foreach { case (e, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length.toLong),
        s"$e positions not a dense permutation")
    }
    // the epochs order the bins DIFFERENTLY (the point of reshuffling)
    val orderOf = byEpoch.view.mapValues(_.sortBy(_.getLong(1)).map(r =>
      (r.getString(2), r.getString(3), r.getLong(4))).toSeq).toMap
    assert(orderOf("ep0") != orderOf("ep1"), "epoch orders identical")
    // bins match the XP1 packer exactly (same derivation, same counts)
    val packed = PipelineQueries.packSequences(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    byEpoch("ep0").foreach { r =>
      val k = (r.getString(2), r.getString(3), r.getLong(4))
      assert(packed(k) == ((r.getLong(5), r.getLong(6))),
        s"bin census diverged from the packer: $k")
    }
  }

  test("XP17 incremental packing equals a full repack restricted to the delta") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"lang", $"source", $"doc_id", $"text")
      .as[(String, String, Long, String)].collect()
    def nTok(t: String): Long = "\\S{1,4}".r.findAllIn(t).size.toLong
    val thr = docs.map(_._3).max * 7 / 10
    // full-repack manifest replay over the WHOLE corpus (the layout the
    // incremental path must continue exactly)
    val full = docs.groupBy(d => (d._1, d._2)).toSeq.flatMap { case ((l, src), ds) =>
      var cum = 0L
      val binPos = scala.collection.mutable.Map[Long, Long]()
      ds.sortBy(_._3).map { case (_, _, id, t) =>
        val n = nTok(t)
        val bin = cum / 256L
        val pos = binPos.getOrElse(bin, 0L) + 1
        binPos(bin) = pos
        val row = (l, src, bin, pos, id, n, cum % 256L)
        cum += n
        row
      }
    }.toSet
    val expected = full.filter(_._5 > thr)
    val got = PipelineQueries.packIncremental(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expected,
      s"incremental diverged from full repack: extra=${got -- expected} " +
        s"missing=${expected -- got}")
    // the delta must actually share a boundary bin with the corpus
    // somewhere (otherwise the state-continuation path went untested)
    val corpusBins = full.filter(_._5 <= thr).map(r => (r._1, r._2, r._3))
    assert(got.exists(r => corpusBins.contains((r._1, r._2, r._3))),
      "no delta doc landed in a corpus boundary bin at this SF")
  }

  test("M3 variant: typed VARIANT path agrees with string JSON path") {
    import spark.implicits._
    val viaVariant = WarehouseQueries.variantExtract(spark, sf).collect()
    val viaString = Tables.events(spark, sf)
      .select($"event_type",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"k").as("sum_k"), min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy($"event_type").collect()
    assert(viaVariant.toSeq == viaString.toSeq)
  }
}
