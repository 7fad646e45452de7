package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.Tables._

/** Corpus-assembly operators (PipelineOps) + the round-5 additions that
  * ride with them (sim_mips exactness, graph_bfs fixture): invariants the
  * DuckDB oracle can't express — packing contiguity, chunk coverage,
  * canonical-form laws, prune exactness, and the unreached-sentinel path.
  */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._



  test("pipeline_node_embed_audit: trained edges outscore sampled non-edges") {
    val rows = PipelineOps.pipelineNodeEmbedAudit(
      orders(spark, sf0001), lineitem(spark, sf0001)).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getLong(1)).sum
    val edgeMass = rows.map(_.getLong(2)).sum
    val negMass = rows.map(_.getLong(3)).sum
    val wins = rows.map(_.getLong(4)).sum
    // the learned space must separate structure from noise: true edges
    // carry more cosine mass than hash-sampled non-edges, and the true
    // edge outranks its paired negative more often than not
    assert(edgeMass > negMass,
      s"edge mass $edgeMass must exceed negative mass $negMass")
    assert(wins * 2 > n, s"edge must win the paired comparison > half: $wins of $n")
  }

  test("pipeline_node_embed: SGNS loss decreases over rounds; embeddings move") {
    val (out, losses) = PipelineOps.nodeEmbedWithLoss(
      orders(spark, sf0001), lineitem(spark, sf0001),
      steps = 4, window = 2, dim = 4, rounds = 3, lr = 0.5, lossTrace = true)
    assert(losses.length === 3)
    // weighted squared error must strictly decrease round over round --
    // the training signal is real, not a deterministic no-op
    assert(losses(1) < losses(0) && losses(2) < losses(1),
      s"loss must decrease monotonically: $losses")
    val rows = out.collect()
    assert(rows.nonEmpty)
    // the model actually moved off its init for at least some nodes
    val moved = rows.count { r =>
      val node = r.getLong(0)
      (1 to 4).exists { i =>
        r.getLong(i) != ((node * 37 + i * 101) % 2001 - 1000) * 1000
      }
    }
    assert(moved > 0, "no embedding moved off its init -- no training happened")
  }

  test("pipeline_node_embed_served: probed-cell candidates agree with the brute-force twin") {
    val served = PipelineOps.pipelineNodeEmbedServed(spark, sf0001).collect()
    assert(served.nonEmpty, "served twin returned no rows")
    // per probe: at most k rows, ranks contiguous from 1, cos non-increasing
    served.groupBy(_.getLong(0)).foreach { case (probe, rows) =>
      val byRank = rows.sortBy(_.getInt(1))
      assert(byRank.length <= 3 && byRank.head.getInt(1) === 1)
      assert(byRank.map(_.getInt(1)).toSeq === (1 to byRank.length),
        s"probe $probe ranks not contiguous")
      val cs = byRank.map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        s"probe $probe cos not non-increasing: ${cs.toSeq}")
    }
    // every served (probe, node) cosine must equal the brute-force
    // twin's number for that pair EXACTLY — same integer micro-unit
    // arithmetic, the layout only restricts the candidate set
    val brute = PipelineOps.pipelineNodeEmbedTopk(
      orders(spark, sf0001), lineitem(spark, sf0001), k = 1600).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    served.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(brute.get(key).contains(r.getDouble(3)),
        s"served cos for $key diverges from the brute-force arithmetic")
    }
  }

  test("pipeline_node_embed_recall: gap non-negative, agreement bounded, some recall") {
    val rows = PipelineOps.pipelineNodeEmbedRecall(spark, sf0001).collect()
    assert(rows.length === 3, "one row per rank 1..3")
    rows.foreach { r =>
      val (n, served, same, gap) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(same <= served && served <= n,
        s"agreement must be bounded by hits by probes: $r")
      // a subset top-k can never beat the exhaustive scan at the same rank
      assert(gap >= 0L, s"negative cosine gap: $r")
    }
    assert(rows.map(_.getLong(3)).sum > 0,
      "the probed-cell layout should agree with brute force somewhere")
  }

  test("pipeline_pack: offsets are gapless per source and sequence spans are arithmetic") {
    val out = PipelineOps.pipelinePack(documents(spark, sf0001)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (src, docs) =>
      val sorted = docs.sortBy(_._2)
      // the token stream is gapless: each doc starts where the previous ended
      sorted.sliding(2).foreach {
        case Array((_, _, n0, s0, _, _, _), (_, id1, _, s1, _, _, _)) =>
          assert(s1 === s0 + n0, s"$src doc $id1 starts at $s1, expected ${s0 + n0}")
        case _ =>
      }
      assert(sorted.head._4 === 0L, s"$src first doc does not start at offset 0")
      sorted.foreach { case (_, id, n, start, sf, sl, ns) =>
        assert(sf === start / 64, s"$src doc $id seq_first")
        assert(sl === (start + n - 1) / 64, s"$src doc $id seq_last")
        assert(ns === sl - sf + 1 && ns >= 1, s"$src doc $id n_seqs")
      }
    }
  }

  test("pipeline_mix: full-rate sources keep everything, shares sum to 1, rerun is identical") {
    val docs = documents(spark, sf0001)
    val out = PipelineOps.pipelineMix(docs).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(out.length === 20)
    out.foreach { case (src, rate, nIn, nKept, _, _) =>
      if (rate == 1.0) assert(nKept === nIn, s"$src rate-1.0 dropped docs")
      else {
        assert(nKept <= nIn, src)
        // hex-digit thresholds are exact 16ths; binomial 3σ band on n=25
        val expect = nIn * rate
        assert(math.abs(nKept - expect) <= 3 * math.sqrt(expect * (1 - rate)) + 1,
          s"$src kept $nKept of $nIn at rate $rate — hash selection skewed")
      }
    }
    assert(math.abs(out.map(_._6).sum - 1.0) < 1e-4, "token shares do not sum to 1")
    // content-hash selection: a rerun is bit-identical (no RNG state)
    val again = PipelineOps.pipelineMix(docs).collect()
      .map(r => (r.getString(0), r.getLong(3)))
    assert(again.toSeq === out.map(r => (r._1, r._4)).toSeq)
  }

  test("pipeline_curriculum: closed-form stage cut reproduces ntile's remainder rule on ties") {
    // 6 equal-score docs into 4 stages: ntile front-loads the remainder →
    // sizes (2,2,1,1) with membership decided purely by the doc_id
    // tie-break — the per-score row_number path. Every text has 2 tokens
    // and n_chars 8 → score floor(8*1000/2) = 4000 for all.
    val docs = (1L to 6L).map(id => (id, "a b", 8L))
      .toDF("doc_id", "text", "n_chars")
    val out = PipelineOps.pipelineCurriculum(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      (1L, 2L, 4L, 4000L, 4000L, 1L),
      (2L, 2L, 4L, 4000L, 4000L, 3L),
      (3L, 1L, 2L, 4000L, 4000L, 5L),
      (4L, 1L, 2L, 4000L, 4000L, 6L)), s"got ${out.toSeq}")
  }

  test("pipeline_span_corruption: span arithmetic exact, mask matches the md5 rule") {
    // 7 tokens → 3 spans of sizes 3,3,1; the mask per span recomputed
    // here with the same md5("<doc>|<span>") first-hex-digit rule.
    val docs = Seq((7L, "t0 t1 t2 t3 t4 t5 t6", 20L))
      .toDF("doc_id", "text", "n_chars")
    def maskOf(doc: Long, i: Long): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(s"$doc|$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      hex.charAt(0) < '3'
    }
    val sizes = Seq(3L, 3L, 1L)
    val expMaskedSpans = (0L to 2L).count(maskOf(7L, _)).toLong
    val expMaskedToks = (0L to 2L).filter(maskOf(7L, _)).map(i => sizes(i.toInt)).sum
    val r = PipelineOps.pipelineSpanCorruption(docs).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((7L, 7L, 3L)))
    assert(r.getLong(3) === expMaskedSpans, s"masked spans ${r.getLong(3)}")
    assert(r.getLong(4) === expMaskedToks, s"masked tokens ${r.getLong(4)}")
    assert(r.getDouble(5) === math.round(expMaskedToks / 7.0 * 1e6) / 1e6)
    // corpus invariants at sf0.001: bounds hold for every doc
    val all = PipelineOps.pipelineSpanCorruption(documents(spark, sf0001)).collect()
    assert(all.nonEmpty)
    all.foreach { row =>
      assert(row.getLong(2) === (row.getLong(1) + 2) / 3)
      assert(row.getLong(3) >= 0 && row.getLong(3) <= row.getLong(2))
      assert(row.getLong(4) <= row.getLong(3) * 3)
    }
  }

  test("pipeline_span_render: rendered pair matches the hand-assembled mask; counts agree with the plan") {
    def maskOf(doc: Long, i: Long): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s"$doc|$i".getBytes("UTF-8")).map("%02x".format(_)).mkString.head < '3'
    }
    val toks = Seq("t0", "t1", "t2", "t3", "t4", "t5", "t6")
    val docs = Seq((7L, toks.mkString(" "))).toDF("doc_id", "text")
    val r = PipelineOps.pipelineSpanRender(docs).collect().head
    val segs = toks.grouped(3).toSeq
    val masks = (0L to 2L).map(maskOf(7L, _))
    val expIn = segs.zip(masks)
      .flatMap { case (s, m) => if (m) Seq("<M>") else s }.mkString(" ")
    val expTgt = segs.zip(masks).collect { case (s, true) =>
      "<M> " + s.mkString(" ") }.mkString(" ")
    assert(r.getString(2) === expIn, s"input: ${r.getString(2)}")
    assert(r.getString(3) === expTgt, s"target: ${r.getString(3)}")
    // consistency with the planning entry: sentinel count == masked spans
    val plan = PipelineOps.pipelineSpanCorruption(docs).collect().head
    assert(r.getString(2).split(" ").count(_ == "<M>") === plan.getLong(3))
  }

  test("text_chunk rejects stride outside (0, width] before any coverage is lost") {
    val docs = documents(spark, sf0001)
    intercept[IllegalArgumentException](PipelineOps.textChunk(docs, width = 32, stride = 33))
    intercept[IllegalArgumentException](PipelineOps.textChunk(docs, width = 32, stride = 0))
    intercept[IllegalArgumentException](PipelineOps.textChunk(docs, width = 32, stride = -1))
    // boundary: stride == width (no overlap) is a legal tiling
    assert(PipelineOps.textChunk(docs, width = 32, stride = 32).count() > 0)
  }

  test("text_chunk: chunks cover every token, stride is constant, text round-trips") {
    val docs = documents(spark, sf0001)
    val nToks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = PipelineOps.textChunk(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === sorted.indices.map(_.toLong),
        s"doc $doc chunk_idx not contiguous")
      sorted.foreach { case (_, i, start, len, text) =>
        assert(start === i * 24, s"doc $doc chunk $i start")
        assert(len === math.min(32L, nToks(doc) - start), s"doc $doc chunk $i len")
        assert(text.split(" ", -1).length.toLong === len, s"doc $doc chunk $i text width")
      }
      val last = sorted.last
      assert(last._3 + last._4 === nToks(doc), s"doc $doc tail tokens uncovered")
    }
  }

  test("dedup_url: canonical form is lowercase, tracking-free, param-sorted; collision census exact") {
    val out = PipelineOps.dedupUrl(documents(spark, sf0001)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 200) // 500 docs, page identity repeats every 200
    out.foreach { case (url, n, first) =>
      assert(url === url.toLowerCase, s"case survived canonicalization: $url")
      assert(!url.contains("utm_"), s"tracking param survived: $url")
      assert(!url.contains("#"), s"fragment survived: $url")
      val params = url.substring(url.indexOf('?') + 1).split("&").toSeq
      assert(params === params.sorted, s"params not canonical-ordered: $url")
      assert(first === (first % 200), s"first_doc $first is not the smallest copy")
    }
    // ids 0..499 mod 200: residues 0..99 have 3 copies, 100..199 have 2
    assert(out.count(_._2 == 3) === 100 && out.count(_._2 == 2) === 100,
      "collision census does not match the id construction")
  }

  test("sim_mips: norm-bound pruning is exact — equals unpruned brute force") {
    val e = embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val q = e(7L)
    val brute = e.toSeq.filter(_._1 != 7L)
      .map { case (id, v) =>
        val ip = v.zip(q).map { case (a, b) => a * b }.sum
        (id, math.rint(ip * 1e6) / 1e6)
      }
      .sortBy { case (id, ip) => (-ip, id) }
      .take(10)
    val got = SimOps.simMips(embeddings(spark, sf0001)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === brute, s"pruned top-k diverges from brute force:\n$got\nvs\n$brute")
  }

  test("graph_bfs: fixture distances exact; unreached component reports the -1 sentinel") {
    // seed = node 64 (customer 32): cust32—supp1 and cust1—supp1 give
    // hops 64:0, 3:1, 2:2; cust5—supp9 (nodes 10,19) is disconnected.
    val orders = Seq((1L, 32L), (2L, 1L), (3L, 5L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((1L, 1L), (2L, 1L), (3L, 9L)).toDF("l_orderkey", "l_suppkey")
    val out = GraphOps.graphBfs(orders, lineitem).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((-1L, 2L, 10L), (0L, 1L, 64L), (1L, 1L, 3L), (2L, 1L, 2L)),
      s"got ${out.toSeq}")
  }

  test("pipeline_bpe_train: greedy leftmost-first application and weighted lexicographic argmax") {
    // corpus: 'aaa' ×3, 'ab' ×2. Round 1 must pick (a,a) with WEIGHTED
    // count 6 (two adjacent pairs per 'aaa'); greedy LEFTMOST application
    // turns 'aaa' into [aa, a] — so round 2's best is (aa, a) ×3. A
    // rightmost (or re-scanning-after-merge) application would yield
    // [a, aa] and flip round 2's winner to (a, aa): the assertion pins
    // the exact BPE rule, not just "some merge happened".
    val docs = Seq((1L, "aaa aaa aaa ab ab")).toDF("doc_id", "text")
    val merges = PipelineOps.pipelineBpeTrain(docs, rounds = 2)
      .select("round", "sym_a", "sym_b", "merged", "cnt")
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(merges === Seq(
      (1, "a", "a", "aa", 6L),
      (2, "aa", "a", "aaa", 3L)), s"got $merges")
  }

  test("pipeline_pretrain_v2: each of the six funnel stages removes exactly its seeded casualty") {
    // 50 words + stopwords → quality ≥ 0.5; all trigrams distinct → repetition 0
    val benchDoc = (1 to 50).map(i => if (i % 5 == 0) "and" else s"bench$i").mkString(" ")
    val good = (1 to 50).map(i => if (i % 5 == 0) "the" else s"word$i").mkString(" ")
    val near = good.replace("word7", "swapped")
    // passes quality (length + letters + "the") but trigram dup frac ≈ 0.94
    val repetitive = Seq.fill(17)("the cat sat").mkString(" ")
    // embeds benchDoc's first 8 tokens verbatim → one shared 8-gram with the
    // benchmark slice; everything else distinct so no dedup stage claims it
    val contaminated = ("bench1 bench2 bench3 bench4 and bench6 bench7 bench8 " +
      (9 to 50).map(i => if (i % 5 == 0) "the" else s"fill$i").mkString(" "))
    val docs = Seq(
      (0L, benchDoc),      // doc_id % 50 == 0 → benchmark slice, leaves at stage 5
      (1L, good),          // the sole survivor
      (2L, good),          // exact dup of 1 → dropped at stage 3
      (3L, near),          // near dup of 1 → dropped at stage 4
      (4L, "x9 !!"),       // junk → dropped at the quality gate (stage 1)
      (5L, repetitive),    // dup-trigram fraction > 5% → dropped at stage 2
      (6L, contaminated))  // shares an 8-gram with doc 0 → dropped at stage 5
      .toDF("doc_id", "text")
    val stages = PipelineOps.pipelinePretrainV2(docs).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stages(0)._1 === 7L && stages(1)._1 === 6L && stages(2)._1 === 5L &&
      stages(3)._1 === 4L && stages(4)._1 === 3L && stages(5)._1 === 1L,
      s"funnel counts: $stages")
    // census is monotone non-increasing; the survivor carries its 50 tokens
    assert((0 to 5).map(stages(_)._2).sliding(2).forall(p => p(0) >= p(1)))
    assert(stages(5)._2 === 50L, s"survivor token census: ${stages(5)._2}")
  }

  test("pipeline_quality_classifier: training separates the classes and is deterministic") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = PipelineOps.pipelineQualityClassifier(docs)
      .select("score", "pred_en", "is_en")
      .as[(Double, Boolean, Boolean)].collect().toSeq
    // scores stay inside the algebraic sigmoid's range
    assert(out.forall { case (s, _, _) => s >= 0.0 && s <= 1.0 })
    // the learned scores must actually separate the weak label: mean
    // score of English docs strictly above non-English (gradient moved
    // the stop-ratio/alpha-ratio weights in the predictive direction)
    val (en, other) = out.partition(_._3)
    val meanEn = en.map(_._1).sum / en.size
    val meanOther = other.map(_._1).sum / other.size
    assert(meanEn > meanOther + 1e-4,
      s"no separation after training: en=$meanEn other=$meanOther")
    // rerun is bit-identical (quantized gradients — no summation-order drift)
    val rerun = PipelineOps.pipelineQualityClassifier(docs)
      .select("score", "pred_en", "is_en")
      .as[(Double, Boolean, Boolean)].collect().toSeq
    assert(rerun === out)
  }

  test("pipeline_classifier_calibration: bin accounting, ECE identity, spread corpus fills bins") {
    import spark.implicits._
    // crafted spread: strongly-English docs (all-lowercase + every
    // stopword) vs symbol-heavy non-English — after 3 GD rounds the two
    // classes score far enough apart to land in different bins
    val docs = (0 until 60).map { i =>
      if (i % 2 == 0)
        (i.toLong, "the and of to in a is it words here more lowercase text", "en")
      else
        (i.toLong, "ZZZZ 9999 #### XXXX 0000 @@@@ YYYY 8888 $$$$ WWWW", "xx")
    }.toDF("doc_id", "text", "lang")
    val out = PipelineOps.pipelineClassifierCalibration(docs).collect()
    val binRows = out.filter(_.getInt(0) >= 0)
    val summary = out.filter(_.getInt(0) === -1).head
    assert(binRows.length >= 2, s"spread corpus must fill >=2 bins: ${out.toSeq}")
    // accounting: bin populations sum to the corpus; summary repeats it
    assert(binRows.map(_.getLong(1)).sum === 60L)
    assert(summary.getLong(1) === 60L)
    // every rate/mean stays in [0, 1e6] micro-units
    binRows.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 1000000L, s"mean: $r")
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L, s"rate: $r")
    }
    // the ECE identity: summary gap = sum(n·gap) DIV sum(n) of the bins
    val ece = binRows.map(r => r.getLong(1) * r.getLong(4)).sum / 60L
    assert(summary.getLong(4) === ece, s"ECE mismatch: ${summary.getLong(4)} vs $ece")
  }

  test("pipeline_preference_pairs: argmax/argmin picks, tie-break, and degenerate-group drop") {
    import spark.implicits._
    val docs = Seq(
      // group (web, en): doc 1 ttr=1.0, doc 2 ttr=0.5, doc 3 ttr=1.0 (tie -> larger id wins chosen)
      (1L, "a b c", "en", "web", 0L),
      (2L, "a a b b", "en", "web", 0L),
      (3L, "x y", "en", "web", 0L),
      // group (web, fr): single candidate -> no pair emitted
      (4L, "q r s", "fr", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = PipelineOps.preferencePairs(docs).collect()
    assert(out.length === 1, s"degenerate group must drop: ${out.toSeq}")
    val r = out(0)
    assert(r.getString(0) === "web" && r.getString(1) === "en")
    assert(r.getLong(2) === 3L, "ttr tie must break toward the larger doc_id")
    assert(r.getLong(3) === 2L)
    assert(r.getDouble(4) === 0.5 && r.getLong(5) === 3L)
  }

  test("pipeline_unigram_lm: segmentations reconstruct their words exactly") {
    val out = PipelineOps.pipelineUnigramLm(Tables.documents(spark, sf0001))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (w, seg, nPieces) = (r.getString(1), r.getString(5), r.getInt(4))
      assert(seg.replace(" ", "") === w,
        s"seg '$seg' must concatenate back to '$w'")
      assert(seg.split(" ").length === nPieces)
      assert(r.getLong(3) > 0L, "cost must be positive")
    }
  }

  test("pipeline_unigram_lm: hard-EM re-scoring flips a seed-inflated piece") {
    import spark.implicits._
    // 'ab' is substring-frequent via 'zabz' (seed count 61) but never
    // USED in round-1 segmentations except by the word 'ab' itself
    // (zabz keeps the whole-word piece) -> its usage count collapses to
    // 1, round-2 cost rises above cost(a)+cost(b), and the segmentation
    // of 'ab' must flip from the single piece to 'a b'
    def rep(w: String, n: Int) = Seq.fill(n)(w)
    val text = (rep("zabz", 60) ++ rep("za", 40) ++ rep("bz", 40) ++
      rep("ab", 1) ++ rep("a", 30) ++ rep("b", 30)).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val segs = PipelineOps.pipelineUnigramLm(docs)
      .filter(col("w") === "ab")
      .collect().map(r => r.getInt(0) -> r.getString(5)).toMap
    assert(segs(1) === "ab", "round 1 rides the seed-inflated count")
    assert(segs(2) === "a b", "round 2 must re-segment from usage counts")
  }

  test("pipeline_unigram_fertility: per-lang averages are piece-per-word exact") {
    val f = PipelineOps.pipelineUnigramFertility(Tables.documents(spark, sf0001))
      .collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      assert(r.getDouble(3) >= 1.0, "every word is at least one piece")
      assert(r.getLong(2) >= r.getLong(1),
        "unigram pieces can never undercut whitespace words")
    }
  }

  test("pipeline_wordpiece_train: likelihood argmax diverges from BPE's frequency argmax") {
    import spark.implicits._
    // (x,y) is the FREQUENT pair (50 joint, but x and y each appear 150
    // times) while (q,z) is the COHESIVE pair (20 joint, q and z occur
    // nowhere else): BPE must pick xy, WordPiece must pick qz —
    // score(x,y) = 50e12/(150·150) ≈ 2.2e9 < score(q,z) = 20e12/400 = 5e10
    def rep(w: String, k: Int) = Seq.fill(k)(w)
    val text = (rep("xy", 50) ++ rep("x", 100) ++ rep("y", 100) ++
      rep("qz", 20)).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val wp = PipelineOps.pipelineWordpieceTrain(docs, rounds = 1).collect()
    assert(wp.length === 1)
    assert((wp(0).getString(1), wp(0).getString(2)) === (("q", "z")),
      s"WordPiece round 1 must pick the cohesive pair: ${wp(0)}")
    assert(wp(0).getLong(4) === 20L && wp(0).getLong(5) === 50000000000L)
    val bpe = PipelineOps.pipelineBpeTrain(docs, rounds = 1).collect()
    assert((bpe(0).getString(1), bpe(0).getString(2)) === (("x", "y")),
      s"BPE round 1 must pick the frequent pair: ${bpe(0)}")
    // apply: after the qz merge, the word qz is ONE piece, xy still two
    val ap = PipelineOps.pipelineWordpieceApply(docs, rounds = 1).collect()
    assert(ap.length === 1)
    // 270 whitespace words; xy contributes 2 pieces ×50, x/y 1 ×200, qz 1 ×20
    assert(ap(0).getLong(1) === 270L && ap(0).getLong(2) === 320L)
  }

  test("pipeline_pack_sweep: the 64-budget row equals the packer's realized count; dial monotone") {
    val docs = Tables.documents(spark, sf0001)
    val sweep = PipelineOps.pipelinePackSweep(docs).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // ceil(T/B) per source must equal what the actual packer realizes
    val realized = PipelineOps.pipelinePack(docs)
      .groupBy(col("source")).agg((max(col("seq_last")) + 1).as("s"))
      .agg(sum(col("s"))).collect()(0).getLong(0)
    assert(sweep(64)._1 === realized,
      s"sweep row disagrees with the packer: ${sweep(64)._1} vs $realized")
    assert(sweep(64)._1 >= sweep(256)._1 && sweep(256)._1 >= sweep(1024)._1)
    sweep.values.foreach(v =>
      assert(v._3 > 0 && v._3 <= 1000000L, s"utilization out of range: $v"))
  }

  test("pipeline_wordpiece_fertility: per-lang averages are piece-per-word exact") {
    val f = PipelineOps.pipelineWordpieceFertility(Tables.documents(spark, sf0001))
      .collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      assert(r.getDouble(3) >= 1.0, "every word is at least one piece")
      assert(r.getLong(2) >= r.getLong(1),
        "pieces can never undercut whitespace words")
    }
  }

  test("pipeline_dsir_resample: overwhelming weight always drawn first; k caps the draw") {
    import spark.implicits._
    // doc 1 is pure target vocabulary repeated — its log weight dwarfs
    // the ±few-unit Gumbel noise, so rank 1 is deterministic (the
    // sample_weighted overwhelming-weight convention); 5 docs with k=3
    // must yield exactly 3 rows
    def rep(w: String, k: Int) = Seq.fill(k)(w).mkString(" ")
    val docs = Seq(
      (1L, rep("alpha", 40) + " " + rep("beta", 40), "en"),
      (2L, rep("gamma", 40), "de"), (3L, rep("delta", 40), "de"),
      (4L, rep("gamma", 20) + " " + rep("delta", 20), "de"),
      (5L, "alpha gamma", "de")
    ).toDF("doc_id", "text", "lang")
    val out = PipelineOps.pipelineDsirResample(docs, k = 3).collect()
    assert(out.length === 3)
    assert(out(0).getInt(0) === 1 && out(0).getLong(1) === 1L,
      s"the overwhelming-weight doc must be drawn first: ${out.toSeq}")
    // ranks are 1..3 and keys strictly follow the rank order
    assert(out.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    val keys = out.map(_.getLong(5))
    assert(keys(0) >= keys(1) && keys(1) >= keys(2))
  }

  test("pipeline_dsir: selection follows token content, not the lang label") {
    import spark.implicits._
    // target slice (en) speaks alpha/beta; the rest speaks gamma/delta.
    // doc 7 is LABELED de but WRITTEN in target vocabulary — DSIR scores
    // the bag, so it must come out selected while the gamma/delta docs
    // must not (the content-vs-metadata distinction is the whole point
    // of importance resampling over hashed features).
    val docs = Seq(
      (1L, "alpha alpha beta", "en"), (2L, "alpha beta beta", "en"),
      (3L, "beta alpha alpha", "en"), (4L, "gamma gamma delta", "de"),
      (5L, "gamma delta delta", "de"), (6L, "delta gamma gamma", "de"),
      (7L, "alpha beta alpha", "de")
    ).toDF("doc_id", "text", "lang")
    // the observed-support smoothing is what lets this tiny fixture
    // carry signal at the default 1024 buckets (add-one over the full
    // hash range would drown 21 tokens); the four planted tokens are
    // collision-free mod 1024 (checked against md5 directly)
    val out = PipelineOps.pipelineDsir(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out.size === 7)
    // feature count = token occurrences (bag semantics)
    assert(out(1)._1 === 3L && out(4)._1 === 3L)
    Seq(1L, 2L, 3L, 7L).foreach { id =>
      assert(out(id)._2 > 0L && out(id)._3 === 1,
        s"target-vocabulary doc $id must be selected: ${out(id)}")
    }
    Seq(4L, 5L, 6L).foreach { id =>
      assert(out(id)._2 < 0L && out(id)._3 === 0,
        s"off-target doc $id must be rejected: ${out(id)}")
    }
  }
}
