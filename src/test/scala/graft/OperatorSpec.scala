package graft

import org.apache.spark.sql.functions._

/** Cross-cutting operator invariants over the sf0.001 fixture — the
  * oracle-differential harness (tools/check.py) is the exhaustive gate;
  * these specs pin the structural properties it can't express. */
class OperatorSpec extends SparkSpec {
  import spark.implicits._
  private val d = "/root/testdata/sf0.001"

  test("every registered query has either an oracle or a doc'd rows-only check") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"orphan oracles: ${o -- q}")
    // every query is oracled — the sketch-based op emits exact-count +
    // bounded-error boolean so even it is SQL-expressible
    assert((q -- o).isEmpty, s"unexpected rows-only: ${q -- o}")
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("a3 top-3: at most 3 rows per key, ranks contiguous from 1") {
    val df = SparkEntry.queries("a3_top3_per_key")(spark, d)
    val byKey = df.groupBy($"user_id")
      .agg(count(lit(1)).as("n"), max($"rn").as("maxrn"), min($"rn").as("minrn"))
    assert(byKey.where($"n" > 3 || $"maxrn" =!= $"n" || $"minrn" =!= 1).count() == 0)
  }

  test("dd_exact: keeper count sums to table size") {
    val df = SparkEntry.queries("dd_exact")(spark, d)
    val total = df.agg(sum($"n_copies")).collect().head.getLong(0)
    assert(total == Tbl.documents(spark, d).count())
  }

  test("dd_minhash_lsh: pairs are ordered and jaccard-bounded") {
    val df = SparkEntry.queries("dd_minhash_lsh")(spark, d)
    assert(df.where($"a" >= $"b").count() == 0)
    assert(df.where($"jaccard" < 0.0 || $"jaccard" > 1.0).count() == 0)
  }

  test("dd_dup_clusters: cluster id is the component min and pairs co-cluster") {
    val clusters = SparkEntry.queries("dd_dup_clusters")(spark, d).persist()
    // cluster id never exceeds any member id (it IS the component min)
    assert(clusters.where($"cluster" > $"doc_id").count() == 0)
    // both endpoints of every evidence pair landed in the same cluster
    val pairs = SparkEntry.queries("dd_minhash_lsh")(spark, d).select($"a", $"b")
    val joined = pairs
      .join(clusters.select($"doc_id".as("a"), $"cluster".as("ca")), "a")
      .join(clusters.select($"doc_id".as("b"), $"cluster".as("cb")), "b")
    assert(joined.where($"ca" =!= $"cb").count() == 0)
    clusters.unpersist()
  }

  test("dd_simhash: hashes are 32-bit non-negative") {
    val df = SparkEntry.queries("dd_simhash")(spark, d)
    assert(df.where($"simhash" < 0L || $"simhash" > ((1L << 32) - 1)).count() == 0)
  }

  test("sim_topk_brute: k rows per query, cosine within [-1,1], rank-ordered") {
    val df = SparkEntry.queries("sim_topk_brute")(spark, d)
    val perQ = df.groupBy($"q_id").agg(count(lit(1)).as("n"))
    assert(perQ.where($"n" > 5).count() == 0)
    assert(df.where(abs($"cosine") > 1.000001).count() == 0)
    // within a query, rank order must follow cosine desc
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"q_id").orderBy($"rk")
    val bad = df.withColumn("prev", lag($"cosine", 1).over(w))
      .where($"prev".isNotNull && $"prev" < $"cosine")
    assert(bad.count() == 0)
  }

  test("recall metric self-consistency: brute vs itself is exactly 1.0; all recalls bounded") {
    import graft.operators.SimilarityOps
    // the metric pipeline itself must score a perfect index as perfect —
    // a join/alias slip would silently deflate every published recall
    val self = SimilarityOps.recallVsBrute(SimilarityOps.topkBrute)(spark, d)
    assert(self.where($"recall_ppm" =!= 1000000L).count() == 0,
           "recall of the truth against itself must be 1.0 for every query")
    for (q <- Seq("sim_recall_lsh", "sim_recall_ivf", "sim_recall_ivf2",
                  "sim_recall_ivft", "sim_recall_pq", "sim_recall_sq",
                  "sim_recall_mrl")) {
      val r = SparkEntry.queries(q)(spark, d)
      assert(r.count() == 10, s"$q must emit one row per query vector")
      assert(r.where($"hits" < 0L || $"hits" > 3L ||
                     $"recall_ppm" < 0L || $"recall_ppm" > 1000000L).count() == 0,
             s"$q out of bounds")
    }
  }

  test("sim_lsh_ann results are a subset of brute-force candidates' scores") {
    val brute = SparkEntry.queries("sim_topk_brute")(spark, d)
      .select($"q_id", $"vec_id", $"cosine")
    val ann = SparkEntry.queries("sim_lsh_ann")(spark, d)
      .select($"q_id", $"vec_id", $"cosine")
    // ANN cosine values must agree exactly with brute-force where both rank
    val joined = ann.join(brute, Seq("q_id", "vec_id"), "inner")
    assert(joined.where(brute("cosine") =!= ann("cosine")).count() == 0)
  }

  test("sim_pq_ann: 3 rows per query; ADC cosine bounded; codes reconstruct to valid vectors") {
    val df = SparkEntry.queries("sim_pq_ann")(spark, d)
    val perQ = df.groupBy($"q_id").agg(count(lit(1)).as("n"))
    assert(perQ.where($"n" =!= 3).count() == 0)
    // reconstruction of unit-norm-ish vectors keeps |adc cosine| ≲ 1
    assert(df.where(abs($"cosine") > 1.5).count() == 0)
    // PQ is an approximation: its top-1 ADC score can't beat the exact
    // top-1 cosine by more than the quantization error bound (sanity: ≤ +0.5)
    val brute = SparkEntry.queries("sim_topk_brute")(spark, d)
      .where($"rk" === 1).select($"q_id", $"cosine".as("exact1"))
    val pq1 = df.where($"rk" === 1).select($"q_id", $"cosine".as("adc1"))
    assert(pq1.join(brute, "q_id").where($"adc1" > $"exact1" + 0.5).count() == 0)
  }

  test("sim_kmeans_refine: every vector lands in exactly one cell, means bounded") {
    val df = SparkEntry.queries("sim_kmeans_refine")(spark, d)
    val corpus = Tbl.embeddings(spark, d).count()
    // per dim, cell member counts partition the corpus
    val perDim = df.groupBy($"dim").agg(sum($"n").as("tot"))
    assert(perDim.where($"tot" =!= corpus).count() == 0)
    // micro-unit means of unit-norm components stay within [-1e6, 1e6]
    assert(df.where(abs($"mean_e6") > 1000000L).count() == 0)
  }

  test("sim_ivf_nprobe2: per-rank cosines dominate nprobe=1 (recall is monotone)") {
    // probing a second inverted list can only add candidates, so the
    // cosine at every (query, rank) position is >= the nprobe=1 cosine
    val n1 = SparkEntry.queries("sim_ivf_ann")(spark, d)
      .select($"q_id", $"rk", $"cosine".as("c1"))
    val n2 = SparkEntry.queries("sim_ivf_nprobe2")(spark, d)
      .select($"q_id", $"rk", $"cosine".as("c2"))
    assert(n1.join(n2, Seq("q_id", "rk")).where($"c2" < $"c1").count() == 0)
  }

  test("a5 gap fill: synthetic points strictly inside (60s, 1h) gaps") {
    val syn = SparkEntry.queries("a5_gap_fill")(spark, d)
    val ev = Tbl.events(spark, d)
      .select($"user_id", unix_micros($"ts").as("t_us"))
    // no synthetic point may coincide with a real event
    val clash = syn.join(ev, syn("user_id") === ev("user_id") &&
                             syn("syn_ts_us") === ev("t_us"))
    assert(clash.count() == 0)
  }

  test("x_rollup_revenue: grand total equals sum of leaf rows") {
    val df = SparkEntry.queries("x_rollup_revenue")(spark, d).cache()
    val grand = df.where($"region" === "(all)" && $"nation" === "(all)")
      .select($"revenue").collect().head.getDouble(0)
    val leaves = df.where($"region" =!= "(all)" && $"nation" =!= "(all)")
      .agg(round(sum($"revenue"), 4)).collect().head.getDouble(0)
    assert(math.abs(grand - leaves) < 0.01)
    df.unpersist()
  }

  test("sim_semantic_dedup: one row per vector; dup_of is an earlier same-cell mate") {
    val df = SparkEntry.queries("sim_semantic_dedup")(spark, d).persist()
    assert(df.count() == Tbl.embeddings(spark, d).count())
    // a duplicate always points at a strictly earlier keeper
    assert(df.where($"is_dup" && ($"dup_of".isNull || $"dup_of" >= $"vec_id"))
             .count() == 0)
    assert(df.where(!$"is_dup" && $"dup_of".isNotNull).count() == 0)
    // the keeper sits in the same quantizer cell (SemDeDup never
    // compares across clusters)
    val keeperCells = df.select($"vec_id".as("dup_of"), $"cell".as("keeper_cell"))
    assert(df.where($"is_dup").join(keeperCells, "dup_of")
             .where($"cell" =!= $"keeper_cell").count() == 0)
    df.unpersist()
  }

  test("tx_chunk_split: contiguous chunk ids; strides cover every token exactly once") {
    val df = SparkEntry.queries("tx_chunk_split")(spark, d).persist()
    val byDoc = df.groupBy($"doc_id").agg(
      count(lit(1)).as("n"), min($"chunk_idx").as("mini"),
      max($"chunk_idx").as("maxi"),
      max($"start_tok" + $"n_chunk_tokens").as("covered"))
    assert(byDoc.where($"mini" =!= 0 || $"maxi" =!= $"n" - 1).count() == 0)
    // the final chunk ends exactly at the document's token count — no
    // token dropped, none fabricated
    val toks = Tbl.documents(spark, d)
      .where(graft.operators.TextNorm.norm($"text") =!= "")
      .select($"doc_id",
              size(split(graft.operators.TextNorm.norm($"text"), " ")).as("n_tokens"))
    assert(byDoc.join(toks, "doc_id").where($"covered" =!= $"n_tokens").count() == 0)
    // stride < chunk size ⇒ no chunk can shrink below the overlap margin
    assert(df.where($"n_chunk_tokens" < 8).count() == 0)
    df.unpersist()
  }

  test("x_pseudonymize: tokenization is a bijection; aggregates survive re-keying") {
    val df = SparkEntry.queries("x_pseudonymize")(spark, d).persist()
    val ev = Tbl.events(spark, d)
    assert(df.count() == ev.select($"user_id").distinct().count())
    assert(df.agg(sum($"n_events")).collect().head.getLong(0) == ev.count())
    df.unpersist()
  }

  test("x_scd2: versions contiguous from 1; exactly one open row per user; intervals ordered") {
    val df = SparkEntry.queries("x_scd2")(spark, d).persist()
    val byUser = df.groupBy($"user_id").agg(
      count(lit(1)).as("n"), min($"version").as("minv"), max($"version").as("maxv"),
      sum(when($"is_current", 1L).otherwise(0L)).as("open"))
    assert(byUser.where($"minv" =!= 1 || $"maxv" =!= $"n" || $"open" =!= 1)
                 .count() == 0)
    assert(df.where($"valid_to_us".isNotNull && $"valid_from_us" >= $"valid_to_us")
             .count() == 0)
    df.unpersist()
  }

  test("tx_domain_mix + x_skew_profile: shares bounded and ordered") {
    val mix = SparkEntry.queries("tx_domain_mix")(spark, d).persist()
    val n = mix.count()
    // floor-divided shares lose at most 1 ppm each
    val total = mix.agg(sum($"share_ppm")).collect().head.getLong(0)
    assert(total <= 1000000L && total >= 1000000L - n)
    assert(mix.where($"kept_docs" > $"n_docs").count() == 0)
    mix.unpersist()
    val skew = SparkEntry.queries("x_skew_profile")(spark, d).persist()
    assert(skew.count() <= 10)
    assert(skew.where($"share_ppm" > 1000000L || $"skew_x1000" < 1000L).count() == 0)
    skew.unpersist()
  }

  test("sim_mrl_ann: full top-k per query, reranked cosine never exceeds brute's same rank") {
    val mrl = SparkEntry.queries("sim_mrl_ann")(spark, d)
      .select($"q_id", $"rk", $"cosine".as("mrl_cos")).persist()
    val perQ = mrl.groupBy($"q_id").agg(count(lit(1)).as("n"), max($"rk").as("maxrk"))
    assert(perQ.where($"n" =!= 5 || $"maxrk" =!= 5).count() == 0)
    // exact rerank of a candidate subset can tie but never beat the
    // exhaustive scan at the same rank
    val brute = SparkEntry.queries("sim_topk_brute")(spark, d)
      .select($"q_id", $"rk", $"cosine".as("brute_cos"))
    assert(mrl.join(brute, Seq("q_id", "rk"))
              .where($"mrl_cos" > $"brute_cos").count() == 0)
    mrl.unpersist()
  }

  test("tx_corpus_sampler: kept implies sampled and passing score; draw honors the weight") {
    val df = SparkEntry.queries("tx_corpus_sampler")(spark, d).persist()
    assert(df.where($"kept" && !$"sampled").count() == 0)
    assert(df.where($"kept" && $"score_u" < 400000L).count() == 0)
    assert(df.where($"sampled" && $"score_u" >= 400000L && !$"kept").count() == 0)
    // a full-weight source keeps every draw
    assert(df.where($"weight_ppm" === 1000000L && !$"sampled").count() == 0)
    df.unpersist()
  }

  test("tx_bm25: ranks contiguous per qid, scores monotone, hits contain the term") {
    val df = SparkEntry.queries("tx_bm25")(spark, d).persist()
    // 8 query terms (df-ranks 4..11); every returned rank list is 1..n
    val byQ = df.groupBy($"qid")
      .agg(count(lit(1)).as("n"), max($"rk").as("maxrk"), min($"rk").as("minrk"))
    assert(byQ.where($"qid" < 4 || $"qid" > 11).count() == 0)
    assert(byQ.where($"n" > 10 || $"maxrk" =!= $"n" || $"minrk" =!= 1).count() == 0)
    // scores non-increasing in rank order; a single-term query's score is
    // positive (Lucene idf > 0, tf >= 1)
    val self = df.select($"qid", $"rk", $"score_unat")
    val next = df.select($"qid", ($"rk" - 1).as("rk"), $"score_unat".as("next_score"))
    assert(self.join(next, Seq("qid", "rk"))
      .where($"next_score" > $"score_unat").count() == 0)
    assert(df.where($"score_unat" <= 0L).count() == 0)
    df.unpersist()
  }

  test("p13 xml envelope: attribute, entity escaping, missing element") {
    import org.apache.spark.sql.functions.{to_xml, from_xml, struct, lit, col}
    // hostile element text: every character XML must escape, plus a
    // JSON document — if the writer or parser mishandles one entity,
    // the round trip is not identity and this fails before the oracle
    val hostile = """{"k": 7, "s": "<tag> & \"quoted\" 'apos' </tag>"}"""
    val xsd = org.apache.spark.sql.types.StructType.fromDDL(
      "_src STRING, txt STRING, not_there BIGINT")
    val out = Seq(hostile).toDF("txt")
      .withColumn("env", to_xml(struct(lit("ais").as("_src"), $"txt")))
      .select(from_xml(col("env"), xsd).as("x"))
      .select($"x._src", $"x.txt", $"x.not_there")
      .head()
    assert(out.getString(0) === "ais")     // attribute (not element) path
    assert(out.getString(1) === hostile)   // escaping is lossless
    assert(out.isNullAt(2))                // absent element reads as NULL
  }

  test("mm_audio_energy: int16 LE codec roundtrip incl. sign and tail frame") {
    import graft.operators.MultimodalOps.MediaCodec
    // sign + byte order: -100 = 0xFF9C LE = [0x9C, 0xFF]
    assert(MediaCodec.decodePcm(Array(0x9c.toByte, 0xff.toByte)).toSeq === Seq(-100))
    assert(MediaCodec.decodePcm(Array(0x64.toByte, 0x00.toByte)).toSeq === Seq(100))
    // roundtrip = identity over ids with both residue classes of length
    for (id <- Seq(1L, 13L, 63L, 127L)) {
      val xs = MediaCodec.decodePcm(MediaCodec.encodePcm(id))
      assert(xs.length === (256 + id % 64).toInt)
      assert(xs.zipWithIndex.forall { case (x, i) =>
        x === MediaCodec.pcmSample(id, i.toLong) })
      assert(xs.exists(_ < 0), s"fixture $id produced no negative sample")
    }
  }

  test("mm_decode_features: ImageIO decode roundtrip is pixel-exact") {
    import graft.operators.MultimodalOps.MediaCodec
    // the query's digest comes from ImageIO.read over real PNG bytes;
    // the expectation here is computed from the fixture's pure pixel
    // arithmetic WITHOUT touching the codec — so a codec roundtrip that
    // loses or shifts any pixel value fails this, not just the oracle
    def expectedDigest(id: Long): String = {
      val w = (4 + id % 13).toInt
      val h = (3 + id % 11).toInt
      val sb = new StringBuilder
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = MediaCodec.pixelRgb(id, x, y)
        sb.append((rgb >> 16) & 255).append(',')
          .append((rgb >> 8) & 255).append(',')
          .append(rgb & 255).append(';')
      }
      MediaCodec.md5Hex(sb.toString.getBytes("UTF-8"))
    }
    val got = SparkEntry.queries("mm_decode_features")(spark, d)
      .select($"media_id", $"dec_width", $"dec_height", $"pixel_md5")
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === (4 + id % 13).toInt, s"width of $id")
      assert(r.getInt(2) === (3 + id % 11).toInt, s"height of $id")
      assert(r.getString(3) === expectedDigest(id), s"pixels of $id")
    }
  }

  test("x_interval_ops: year-month addition clamps to end-of-month") {
    // Jan 30 + 1 month must land on Feb 29 (leap 2024), time-of-day kept
    val r = spark.sql(
      "SELECT CAST(TIMESTAMP '2024-01-30 12:34:56' + make_ym_interval(0, 1)" +
      " AS STRING) AS t").head.getString(0)
    assert(r === "2024-02-29 12:34:56")
    // and the DT-interval extraction convention: day = TOTAL days
    val d64 = spark.sql(
      "SELECT extract(DAY FROM (TIMESTAMP '2024-03-05 10:00:00' -" +
      " TIMESTAMP '2024-01-01 00:30:00'))").head.get(0).toString.toLong
    assert(d64 === 64L)
  }

  test("x_generator_ops: outer explode keeps empty-array docs as one NULL row") {
    val df = SparkEntry.queries("x_generator_ops")(spark, d).persist()
    val gen = df.where($"tag" === "gen_rows").agg(sum($"v")).head.getLong(0)
    val nulls = df.where($"tag" === "outer_nulls").agg(sum($"v")).head.getLong(0)
    // expectation from non-generator arithmetic: max(k,1) rows per doc
    val k = Tbl.documents(spark, d)
      .select(size(filter(split($"text", " "), t => length(t) > 6)).as("k"))
      .persist()
    assert(gen === k.agg(sum(greatest($"k".cast("long"), lit(1L)))).head.getLong(0))
    assert(nulls === k.where($"k" === 0).count())
    assert(nulls > 0, "fixture must exercise the outer-NULL path")
    df.unpersist(); k.unpersist(); ()
  }

  test("x_try_arith_guarded ≡ x_try_arith (guards reproduce TRY semantics exactly)") {
    val a = SparkEntry.queries("x_try_arith")(spark, d)
    val b = SparkEntry.queries("x_try_arith_guarded")(spark, d)
    assert(a.schema == b.schema)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // and the guarded plan carries no try_* exception machinery
    val ps = b.queryExecution.executedPlan.toString
    assert(!ps.contains("try_"), s"guarded twin still uses try_*:\n$ps")
  }

  test("x_try_arith_guarded ≡ x_try_arith on NEGATIVE values too (magnitude guard)") {
    // The sf corpora carry value > 0 only, so the driver gate never
    // exercises the negative domain — but a large-NEGATIVE cube wraps
    // exactly as silently as a positive one, and the multiply guard must
    // be on |v|. Fixture straddles both edges of the cube bound
    // (|v_c| = 9734 ok / 9735 over), negative ÷0 residues (v_c % 97 = 0),
    // and deep-negative values that would wrap v³·10⁷ twice over.
    val dir = Tbl.scratchDir("neg_events")
    val vals = Seq(-97.34, -97.35, -9734.0, -490.02, -0.97, -1.94, -25000.01,
                   97.34, 97.35, 0.5, -0.5, 123.45)
    spark.range(vals.size.toLong)
      .select($"id".as("event_id"),
        timestamp_micros(lit(1700000000000000L) + $"id" * 1000000L).as("ts"),
        ($"id" % 3).as("user_id"),
        concat(lit("t"), ($"id" % 2)).as("event_type"),
        element_at(typedLit(vals), ($"id" + 1).cast("int")).as("value"),
        lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val a = SparkEntry.queries("x_try_arith")(spark, dir)
    val b = SparkEntry.queries("x_try_arith_guarded")(spark, dir)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // the fixture must actually fire the negative-overflow path
    assert(a.agg(sum($"n_mul_over")).head.getLong(0) > 0)
  }

  test("x_salted_agg ≡ the naive single-phase aggregation (salt is invisible)") {
    val salted = SparkEntry.queries("x_salted_agg")(spark, d)
    val direct = Tbl.events(spark, d)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum(Tbl.cents($"value")).as("v_c"),
           min(unix_micros($"ts")).as("first_us"),
           max(unix_micros($"ts")).as("last_us"))
      .orderBy($"event_type")
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("x_width_bucket: buckets in [0,21], counts complete, ranges nested in bucket bounds") {
    val df = SparkEntry.queries("x_width_bucket")(spark, d).collect()
    assert(df.map(_.getLong(1)).sum === Tbl.events(spark, d).count())
    assert(df.forall(r => r.getLong(0) >= 0L && r.getLong(0) <= 21L))
    // interior buckets: min/max cents within [lo, hi) of a 2500-wide bin
    df.filter(r => r.getLong(0) >= 1 && r.getLong(0) <= 20).foreach { r =>
      val lo = (r.getLong(0) - 1) * 2500L
      assert(r.getLong(2) >= lo && r.getLong(3) < lo + 2500L, r.toString)
    }
  }

  test("x_minmax_scale: per-mille stays in [0,1000], per-type counts complete") {
    val df = SparkEntry.queries("x_minmax_scale")(spark, d).collect()
    assert(df.forall(r => r.getLong(3) >= 0L && r.getLong(4) <= 1000L))
    assert(df.map(_.getLong(2)).sum === Tbl.events(spark, d).count())
  }

  test("x_global_shuffle: epoch permutation is reproducible and complete") {
    val q = SparkEntry.queries("x_global_shuffle")
    val a = q(spark, d).collect().toSeq
    val b = q(spark, d).collect().toSeq
    assert(a === b, "same epoch key must give the identical permutation")
    val nDocs = Tbl.documents(spark, d).count()
    assert(a.map(_.getLong(1)).sum === nDocs)
    // shard count follows the corpus-proportional law (floored at 32)
    val expectShards = math.max(32L,
      math.ceil(nDocs.toDouble / operators.CurationOps.DocsPerShard).toLong)
    assert(a.forall(r => r.getInt(0) >= 0 && r.getInt(0) < expectShards))
  }

  test("x_global_shuffle: shard count scales with the corpus; permutation law holds at >32 shards") {
    // synthetic corpus big enough to push the law past its 32 floor:
    // 150k docs / 4096 docs-per-shard → 37 shards. Only doc_id is read
    // by the query, so a doc_id-only documents.parquet suffices.
    val dir = Tbl.scratchDir("gs_law")
    spark.range(150000).toDF("doc_id")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val q = SparkEntry.queries("x_global_shuffle")
    val a = q(spark, dir).collect().toSeq
    val expectShards = math.ceil(
      150000.0 / operators.CurationOps.DocsPerShard).toLong // = 37
    assert(expectShards > 32L)
    assert(a.map(_.getInt(0)).distinct.size === expectShards.toInt,
      "every shard in [0, ceil(n/DocsPerShard)) must be populated")
    assert(a.map(_.getLong(1)).sum === 150000L, "permutation must be complete")
    // deterministic at this shard count too: re-run → identical
    // position-weighted checksums per shard
    assert(q(spark, dir).collect().toSeq === a,
      "per-shard permutation checksum must be deterministic at any shard count")
  }
}
