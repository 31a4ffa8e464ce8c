package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PipelineOps

/** Corpus-curation pipeline operators on a planted fixture: packing
  * conserves tokens and respects stream order, splits are deterministic
  * and complete, quota keeps exactly N per group, curate drops dups and
  * out-of-gate docs.
  */
class PipelineSpec extends AnyFunSuite with SparkTest {

  // 40 docs in 2 langs; doc i has i%7+1 tokens; doc 20 duplicates doc 0's
  // text; doc 30 is a single token (below the curate gate)
  private lazy val docs = {
    import spark.implicits._
    (0 until 40).map { i =>
      val text =
        if (i == 20) (0 until 1).map(_ => "tok0 word extra pad five").mkString(" ")
        else if (i == 0) "tok0 word extra pad five"
        else if (i == 30) "solo"
        else (0 to i % 7).map(j => s"w$i$j").mkString(" ")
      (i.toLong, text, if (i % 2 == 0) "en" else "de")
    }.toDF("doc_id", "text", "lang")
  }

  test("sampleSplit is deterministic, complete, and roughly 80/10/10") {
    val a = PipelineOps.sampleSplit(docs).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = PipelineOps.sampleSplit(docs).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b)                       // no RNG state
    assert(a.size == 40)                 // every doc assigned
    val train = a.values.count(_ == "train")
    assert(train >= 24 && train <= 40)   // 80% in expectation on 40 docs
  }

  test("packSequences conserves tokens, packs in doc order, bounds starts") {
    val budget = 10L
    val packs = PipelineOps.packSequences(docs, budget, shards = 2).collect()
    val totalToks = packs.map(_.getAs[Long]("pack_toks")).sum
    val expected = docs.select(
      graft.functions.TextOps.wsTokenCount(col("text")).as("t"))
      .agg(sum(col("t"))).collect()(0).getLong(0)
    assert(totalToks == expected)        // every token lands in exactly one pack
    // within a (lang, shard) stream pack ids are contiguous from 0
    packs.groupBy(r => (r.getString(0), r.getAs[Long]("shard"))).foreach {
      case (_, rows) =>
        val ids = rows.map(_.getAs[Long]("pack_id")).sorted
        assert(ids.head == 0L && ids.sameElements(ids.head to ids.last))
    }
    assert(packs.forall(_.getAs[Long]("n_docs") >= 1L))
  }

  test("derived shard count bounds the (lang, shard) window partition size") {
    // the scale invariant behind packShardsFor: no window task sees more
    // than ~docsPerShard rows (mod doc_id-hash skew), so the running-sum
    // window never degenerates into one giant partition
    assert(PipelineOps.packShardsFor(40L, docsPerShard = 5) == 8)
    assert(PipelineOps.packShardsFor(1000000000L) == 1000)   // 1e9 docs -> 1e3 tasks
    assert(PipelineOps.packShardsFor(1L) == 8)               // small-corpus floor
    val assigned = PipelineOps.packAssignmentsAuto(docs, budgetTokens = 10L,
      docsPerShard = 5L)
    val maxPart = assigned.groupBy(col("lang"), col("shard"))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).collect()(0).getLong(0)
    assert(maxPart <= 3 * 5, s"window partition too large: $maxPart")
    // auto == manual at the same derived width (pure delegation, no drift)
    val manual = PipelineOps.packAssignments(docs, 10L, shards = 8).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("pack_id")).toMap
    val auto = assigned.collect().map(r => r.getLong(0) -> r.getAs[Long]("pack_id")).toMap
    assert(auto == manual)
  }

  test("quotaSample keeps exactly N per group when the group is large enough") {
    val q = PipelineOps.quotaSample(docs, 5).collect()
    val byLang = q.groupBy(_.getString(1))
    assert(byLang("en").length == 5 && byLang("de").length == 5)
    assert(q.forall(_.getAs[Long]("rnk") <= 5L))
    // ranked by token count descending
    byLang.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("toks")).toSeq.sliding(2).forall {
        case Seq(x, y) => x >= y; case _ => true
      })
    }
  }

  test("streaming packer reproduces the batch assignment incrementally") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val budget = 10L
    val fixture = docs.select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    val mem = MemoryStream[(Long, String, String)]
    val stream = mem.toDF().toDF("doc_id", "text", "lang")
    val out = graft.streaming.Ingest.packStream(stream, budget, shards = 2)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("pack_stream").start()
    // two micro-batches in doc_id order — state must carry across batches
    mem.addData(fixture.take(20).toIndexedSeq)
    q.processAllAvailable()
    mem.addData(fixture.drop(20).toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("pack_stream")
      .select(col("doc_id"), col("start_tok"), col("pack_id"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val batch = graft.operators.PipelineOps.packAssignments(docs, budget, shards = 2)
      .select(col("doc_id"), col("start_tok"), col("pack_id"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(streamed == batch)
  }

  test("chunkDocs boundary arithmetic: counts, starts, lengths, empty docs") {
    import spark.implicits._
    // window 4, stride 3: n=4 -> 1 chunk; n=5 -> 2 (second = tokens 4..5);
    // n=7 -> 2 (exact (n-w) divisible by s); n=8 -> 3; n=2 -> 1 short
    // chunk; whitespace-only -> nothing
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val fixture = Seq(
      (4L, words(4)), (5L, words(5)), (7L, words(7)), (8L, words(8)),
      (2L, words(2)), (0L, "   \t  ")
    ).toDF("doc_id", "text")
    val out = PipelineOps.chunkDocs(fixture, window = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    val perDoc = out.keys.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perDoc == Map(4L -> 1, 5L -> 2, 7L -> 2, 8L -> 3, 2L -> 1),
      s"chunk counts wrong: $perDoc")
    // full-window first chunks, correct starts, short tails
    assert(out((4L, 0L)) == (0L, 4L, "w1 w2 w3 w4"))
    assert(out((5L, 1L)) == (3L, 2L, "w4 w5"))
    assert(out((7L, 1L)) == (3L, 4L, "w4 w5 w6 w7"))
    assert(out((8L, 2L)) == (6L, 2L, "w7 w8"))
    assert(out((2L, 0L)) == (0L, 2L, "w1 w2"))
    // every non-final chunk of a multi-chunk doc is the full window
    for (((doc, ci), (_, len, _)) <- out
         if ci < perDoc(doc) - 1)
      assert(len == 4L, s"non-final chunk ($doc, $ci) length $len != 4")
  }

  test("decontaminate flags exactly the train docs sharing bench shingles") {
    import spark.implicits._
    val fixture = Seq(
      (0L, "alpha beta gamma delta", "en"),        // bench doc
      (1L, "alpha beta gamma epsilon", "en"),      // shares "alpha beta gamma"
      (2L, "zeta eta theta iota", "en"),           // clean
      (3L, "x alpha beta gamma delta y", "en")     // shares two shingles
    ).toDF("doc_id", "text", "lang")
    val out = PipelineOps.decontaminate(fixture, col("doc_id") === 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 3L -> 2L))
  }

  test("bloom-prefiltered decontamination equals the exact operator") {
    import spark.implicits._
    val fixture = Seq(
      (0L, "alpha beta gamma delta", "en"),
      (1L, "alpha beta gamma epsilon", "en"),
      (2L, "zeta eta theta iota", "en"),
      (3L, "x alpha beta gamma delta y", "en"),
      (50L, "kappa lambda mu nu xi", "en")         // second bench doc
    ).toDF("doc_id", "text", "lang")
    val pred = col("doc_id") % 50 === 0
    val exact = PipelineOps.decontaminate(fixture, pred)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exactness must not depend on the sketch's precision: a sloppy fpp
    // only adds candidates that the confirm join then removes
    for (fpp <- Seq(0.01, 0.5)) {
      val bloom = PipelineOps.decontaminateBloom(fixture, pred, fpp)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(bloom == exact, s"fpp=$fpp")
    }
  }

  test("vocabTopK returns the K most frequent tokens, ties alphabetical") {
    import spark.implicits._
    val fixture = Seq(
      (0L, "aa bb aa cc", "en"), (1L, "aa bb dd", "en")
    ).toDF("doc_id", "text", "lang")
    val out = PipelineOps.vocabTopK(fixture, 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("aa", 3L), ("bb", 2L), ("cc", 1L)))
  }

  test("streaming curation matches the batch pass on an in-order stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    val fixture = docs.select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)].collect().sortBy(_._1)
      .map { case (id, text, _) => (id, ts(id.toInt), text) }
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val stream = mem.toDF().toDF("doc_id", "ts", "text")
    val out = graft.streaming.Ingest.curateStream(stream, "10 minutes", 2L, 1000L)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("curate_stream").start()
    mem.addData(fixture.take(20).toIndexedSeq)
    q.processAllAvailable()
    mem.addData(fixture.drop(20).toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("curate_stream")
      .select(col("doc_id"), col("toks"), col("cleaned"))
      .as[(Long, Long, String)].collect().toSet
    val batch = graft.operators.PipelineOps.curate(docs, 2L, 1000L)
      .select(col("doc_id"), col("toks"), col("cleaned"))
      .as[(Long, Long, String)].collect().toSet
    assert(streamed == batch)
  }

  test("global shuffle: contiguous in-shard ranks, stable, roughly balanced") {
    import spark.implicits._
    val corpus = spark.range(0, 2000).select(col("id").as("doc_id"))
    val out = PipelineOps.globalShuffle(corpus, shards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 2000 && out.map(_._1).distinct.length == 2000)
    // in-shard positions are a contiguous 1..n ranking
    out.groupBy(_._2).foreach { case (shard, rows) =>
      val ps = rows.map(_._3).sorted
      assert(ps.head == 1L && ps.last == ps.length.toLong, s"shard $shard ranks")
      // hash balance: no shard is more than 2x the even share
      assert(rows.length < 2 * 2000 / 8, s"shard $shard holds ${rows.length}")
    }
    // deterministic, and an existing doc's (shard, key-order) is stable
    // under growth: its shard and its relative order never change, only
    // its numeric rank can shift as new docs splice in
    val again = PipelineOps.globalShuffle(corpus, shards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
    val grown = PipelineOps.globalShuffle(
      spark.range(0, 4000).select(col("id").as("doc_id")), shards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.forall { case (id, shard, _) => grown(id) == shard })
  }

  test("curate drops exact duplicates and out-of-gate docs, keeps min id") {
    val out = PipelineOps.curate(docs, 2L, 1000L).collect()
    val ids = out.map(_.getLong(0)).toSet
    assert(!ids.contains(20L) && ids.contains(0L))  // dup loses to keeper
    assert(!ids.contains(30L))                      // below the token gate
    assert(out.forall(_.getAs[Long]("toks") >= 2L))
    // normalization happened: no uppercase, no squashable whitespace
    assert(out.forall { r =>
      val c = r.getAs[String]("cleaned")
      c == c.toLowerCase && !c.contains("  ")
    })
  }

  test("BPE round mechanics: raw pairs keep multiplicity, replace merges leftmost-greedy") {
    val s = spark
    import s.implicits._
    val pairs = Seq("aaa").toDF("w")
      .select(explode(graft.functions.TextOps.charPairsRaw(col("w"))).as("p"))
      .collect().map(_.getString(0))
    assert(pairs.toSeq === Seq("aa", "aa"), "multiplicity lost")
    // leftmost non-overlapping merge: aaa -> _a (BPE greedy), not a_ or __
    val merged = Seq("aaa").toDF("w")
      .select(expr("replace(w, 'aa', '_')").as("m")).head().getString(0)
    assert(merged === "_a")
  }

  test("quality filter keeps the low-entropy half per language and floors tokens") {
    val kept = graft.SparkEntry.queries("pipe_quality_filter")(
      spark, "/root/testdata/sf0.001").cache()
    val all = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val total = all.count()
    val nKept = kept.count()
    // the median gate keeps roughly half (>= half can pass on ties, token
    // floor can drop a few) — sanity-bound the kept fraction
    assert(nKept > total / 4 && nKept <= total * 3 / 4,
      s"kept $nKept of $total — gate miscalibrated")
    // every kept doc's xent is <= its language's median over ALL scored docs
    val x = graft.operators.Relevance.unigramCrossEntropy(all)
    val withLang = all.select(col("doc_id"), col("lang")).join(x, Seq("doc_id"))
    val meds = withLang.groupBy(col("lang"))
      .agg(expr("percentile(xent, 0.5)").as("med"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    kept.collect().foreach { r =>
      assert(r.getDouble(2) <= meds(r.getString(1)) + 1e-12,
        s"doc ${r.getLong(0)} above the ${r.getString(1)} median")
    }
  }

  test("BPE encode applies both learned merges and shrinks symbol counts") {
    import spark.implicits._
    // top1 = "aa" (6 raw pairs beats "bb"'s 3); merged "aaaa" -> "__";
    // round-2 top = "bb" (3 beats "__"'s 2) -> "bbbb" becomes "++"
    val tmp = java.nio.file.Files.createTempDirectory("graft-bpeenc").toString
    Seq((0L, "aaaa aaaa", "en"), (1L, "bbbb", "en"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.operators.PipelineQueries.queries("pipe_bpe_encode")(spark, tmp)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0L) == (8L, 4L), s"doc0 ${out(0L)}")
    assert(out(1L) == (4L, 2L), s"doc1 ${out(1L)}")
  }

  test("duplicate-line fraction counts repeated non-empty lines") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-dl").toString
    Seq(
      (0L, "header\nbody one\nheader\nbody two", "en"),  // 2 of 4 duplicated
      (1L, "a\n\n \nb", "en"),                           // blanks don't count
      (2L, "x\nx\nx", "en")                              // all duplicated
    ).toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.operators.TextQueries.queries("text_dup_lines")(spark, tmp)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0L) == (4L, 2L))
    assert(out(1L) == (2L, 0L))
    assert(out(2L) == (3L, 3L))
  }

  test("char entropy: zero for a constant string, ln 2 for a 50/50 mix") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ent").toString
    Seq((0L, "aaaaaaaa", "en"), (1L, "abababab", "en"), (2L, "ab\ncd", "en"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.operators.TextQueries.queries("text_entropy")(spark, tmp)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(0L) == (8L, 0.0))
    assert(out(1L)._1 == 8L && math.abs(out(1L)._2 - math.log(2.0)) < 1e-3)
    assert(out(2L)._1 == 4L, "newline must not count as a character")
  }

  test("bpeTrain: greedy merges are deterministic, encode/decode invert, exhaustion stops early") {
    import spark.implicits._
    val words = Seq("aba", "ab", "ba", "abab").toDF("w")
    // pair counts round 1: ab=4 (aba, ab, abab x2), ba=3 -> merge "ab"->A
    // then "Aa"/"ba"/"AA" all count 1 -> ASCII tie-break walks
    // AA -> B, Aa -> C, ba -> D, then no pairs remain: 4 merges, not 26
    val merges = PipelineOps.bpeTrain(words, 26)
    assert(merges.map(t => (t._1, t._2)) ==
      Seq(("ab", "A"), ("AA", "B"), ("Aa", "C"), ("ba", "D")),
      s"unexpected merge table: $merges")
    assert(merges.head._3 == 4L, "round-1 pair count must ride along")
    val rt = words
      .withColumn("e", PipelineOps.bpeEncode(col("w"), merges))
      .withColumn("d", PipelineOps.bpeDecode(col("e"), merges))
    assert(rt.filter(col("d") =!= col("w")).count() == 0,
      "decode must invert encode exactly")
    // encoded forms actually compress: "abab" -> "AA" -> "B"
    val enc = rt.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(enc("abab") == "B", s"greedy chain should fold abab: $enc")
  }

  test("bpeTrain past 26 rounds: BMP markers stay distinct single chars and the deep roundtrip is lossless") {
    import spark.implicits._
    // one 36-symbol word has 35 distinct adjacent pairs, so 30 greedy
    // rounds always find a pair; rounds 26..29 use the U+00C0+ markers
    val words = Seq("abcdefghijklmnopqrstuvwxyz0123456789").toDF("w")
    val merges = PipelineOps.bpeTrain(words, 30)
    assert(merges.size == 30, s"expected 30 merges: ${merges.size}")
    val markers = merges.map(_._2)
    assert(markers.distinct.size == 30 && markers.forall(_.length == 1),
      s"markers must be 30 distinct single chars: $markers")
    assert(markers(26) == "À", s"round 27 marker: ${markers(26)}")
    val rt = words
      .withColumn("e", PipelineOps.bpeEncode(col("w"), merges))
      .withColumn("d", PipelineOps.bpeDecode(col("e"), merges))
      .head()
    assert(rt.getString(2) == rt.getString(0), "deep roundtrip must invert")
    assert(rt.getString(1).length == 36 - 30,
      s"30 merges on one word shrink it by 30 symbols: '${rt.getString(1)}'")
  }
}
