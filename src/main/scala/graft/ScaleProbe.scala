package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Components, Dedup, NaiveBayes, Text}

/** Scaling probe (dev utility): multiply the documents corpus k× (id-
  * shifted copies with a per-copy token rotation so copies are NOT
  * trivial duplicates of each other) and measure the LSH near-dup
  * pipeline and connected-components clustering at growing corpus
  * sizes on fixed cores. The point is the CURVE, not the absolute
  * number: candidate generation is an equi-join on band hashes, so
  * time should grow ~linearly in corpus size while all-pairs designs
  * grow quadratically; components rounds track graph diameter, which
  * is independent of corpus size for dedup graphs.
  *
  * `sbt "runMain graft.ScaleProbe [k1,k2,...]"` (default 1,2,4) on
  * SPARK_GRAFT_SF_DIR (default sf0.1).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val ks = args.headOption.getOrElse("1,2,4").split(",").map(_.toInt).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // split multi-row-group files into ~4 MB input partitions: the
      // driver layout is one parquet FILE per table, and a 100 MB
      // single file would otherwise scan on one core (production data
      // arrives as many files; MakeSf writes 4 MB row groups so sf1
      // scans parallelize the way a real table's file count would)
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).cache()
    val n0 = docs.count()

    // k× document corpus: copy c shifts ids by c*1e6 and rotates each
    // doc's tokens by c, so cross-copy pairs are near-dups (same
    // shingle multiset minus boundary trigrams) without being
    // byte-identical — every dedup stage does full work. One builder
    // for every probe section, so all curves measure the same corpus.
    def scaledDocs(k: Int) = (0 until k).map { c =>
      docs.select((col("doc_id") + c * 1000000L).as("doc_id"),
        when(lit(c) === 0, col("text")).otherwise(
          array_join(concat(
            slice(Text.tokens(col("text")), c + 1, 100000),
            slice(Text.tokens(col("text")), 1, c)), " ")).as("text"))
    }.reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism)

    // SPARK_GRAFT_PROBE_R12=1 skips the pre-round-12 sections so the
    // round-12 receipt sections (SHARDK/AUCFLOOR/QTFLOOR/BPEDEPTH) can
    // run standalone at large k without re-running the full battery.
    val probeR12Only = sys.env.contains("SPARK_GRAFT_PROBE_R12")
    if (!probeR12Only) {
ks.foreach { k =>
      val corpus = scaledDocs(k)

      val sh = corpus.withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), Text.wordShingles(col("t")).as("s"))

      val t0 = System.nanoTime()
      val edges = Dedup.nearDupPairs(sh, "doc_id", "s",
        numHashes = 12, bands = 4, threshold = 0.5).cache()
      val nEdges = edges.count()
      val tPairs = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val comp = Components.connectedComponents(
        corpus.select(col("doc_id")), "doc_id", edges, "id_a", "id_b")
      val nClusters = comp.agg(countDistinct(col("cluster_id"))).head().getLong(0)
      val tComp = (System.nanoTime() - t1) / 1e9

      println(f"SCALE k=$k docs=${k * n0}%7d pairs=$nEdges%8d " +
        f"clusters=$nClusters%7d lsh=$tPairs%7.2fs components=$tComp%7.2fs")
      edges.unpersist()
    }

    // Full-chain composition probe (round-6 verdict #7): x37/x39 don't
    // just run LSH and components — they COMPOSE them with a
    // per-cluster ranking window (x37) / cluster-hash split (x39).
    // Time the composed chain end-to-end so a super-linear term
    // introduced by the composition itself (say, a giant cluster whose
    // ranking window degenerates to one partition as the corpus grows)
    // would bend this curve even when each part's own curve stays flat.
    ks.foreach { k =>
      val corpus = scaledDocs(k)

      def shingled = corpus.withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), Text.wordShingles(col("t")).as("s"))

      // x37 shape: LSH pairs → components → survivor ranking window
      val t0 = System.nanoTime()
      val comp37 = Components.connectedComponents(
        corpus.select(col("doc_id")), "doc_id",
        Dedup.nearDupPairs(shingled, "doc_id", "s",
          numHashes = 12, bands = 4, threshold = 0.5), "id_a", "id_b")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster_id"))
        .orderBy(col("n_tokens").desc, col("doc_id"))
      val survivors = comp37
        .join(corpus.select(col("doc_id"),
          size(Text.tokens(col("text"))).cast("long").as("n_tokens")), "doc_id")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1).count()
      val t37 = (System.nanoTime() - t0) / 1e9

      // x39 shape: LSH pairs → components → group-aware hash split
      val t1 = System.nanoTime()
      val comp39 = Components.connectedComponents(
        corpus.select(col("doc_id")), "doc_id",
        Dedup.nearDupPairs(shingled, "doc_id", "s",
          numHashes = 12, bands = 4, threshold = 0.5), "id_a", "id_b")
      val held = comp39
        .withColumn("split",
          graft.ext.Sampling.holdoutSplit(col("cluster_id"), 230))
        .groupBy(col("split")).agg(count(lit(1)))
        .count()
      val t39 = (System.nanoTime() - t1) / 1e9

      println(f"SCALE-CHAIN k=$k docs=${k * n0}%7d survivors=$survivors%7d " +
        f"splits=$held%2d x37_chain=$t37%7.2fs x39_chain=$t39%7.2fs")
    }

    // Chunk-granularity dedup (the x49 shape) at growing corpus sizes:
    // chunk hashing is a narrow map, occurrence counting one hash
    // aggregate on the chunk md5, the audit join keyed on it — time
    // should track corpus size, never corpus².
    ks.foreach { k =>
      val corpus = scaledDocs(k)
      val chunks = corpus.withColumn("t", Text.tokens(col("text")))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, cast(floor((size(t)-1)/20) as int))," +
            " i -> md5(array_join(slice(t, i*20+1, 20), ' ')))")).as("h"))
      val t0 = System.nanoTime()
      val occ = chunks.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("docs_with"))
      val dupDocs = chunks.join(occ, "h")
        .groupBy(col("doc_id"))
        .agg(sum(when(col("docs_with") > 1, 1L).otherwise(0L)).as("dups"))
        .filter(col("dups") > 0).count()
      println(f"SCALE-CHUNK k=$k docs=${k * n0}%7d dup_docs=$dupDocs%7d " +
        f"t=${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }

    // Embedding path: sign-LSH near-dup (the x10 shape) at growing
    // corpus sizes. Each copy c scales the vectors by (1 + c/1000) —
    // same direction, so cross-copy pairs all collide in their sign
    // bucket and pass the cosine gate: max planted-pair load per size.
    val emb = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        graft.ext.Similarity.toDoubleArray(col("embedding")).as("v"))
      .cache()
    val e0 = emb.count()
    // k× embedding corpus: copy c scales the vectors by (1 + c/1000) —
    // same direction, so cross-copy pairs collide in any
    // direction-based bucket and pass a cosine gate: max planted-pair
    // load per size. Shared by every embedding probe section.
    def scaledEmb(k: Int) = (0 until k).map { c =>
      emb.select((col("vec_id") + c * 1000000L).as("vec_id"),
        transform(col("v"), x => x * (1.0 + c / 1000.0)).as("v"))
    }.reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism)

    ks.foreach { k =>
      val corpus = scaledEmb(k)
        .withColumn("bucket", graft.ext.Similarity.signBucket(col("v"), 8, 64))
      val t0 = System.nanoTime()
      val n = corpus.as("a").hint("merge")
        .join(corpus.as("b"),
          col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .filter(graft.ext.Similarity.cosine(col("a.v"), col("b.v")) >= 0.999)
        .count()
      println(f"SCALE-EMB k=$k vecs=${k * e0}%7d pairs=$n%8d " +
        f"lsh=${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }

    // Repeated-span shape (x55): windows at EVERY token offset →
    // min/max window pair on the window hash (the cross-doc repeat
    // test, one keyed shuffle, no join) → per-doc islands. Work is
    // n·w hashing + two window passes — the curve must track corpus
    // (and dup-mass) size, never corpus².
    // Copies reuse the rotation corpus, so cross-copy window hashes
    // genuinely repeat and the dup mass grows with k (worst case).
    ks.foreach { k =>
      val w = 10
      val corpus = scaledDocs(k)
      val t0 = System.nanoTime()
      val wins = corpus.withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= w)
        .select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, size(t) - $w)," +
            s" i -> md5(array_join(slice(t, i + 1, $w), ' ')))")))
        .select(col("doc_id"), col("pos").as("idx"), col("col").as("h"))
      val wH = org.apache.spark.sql.expressions.Window
        .partitionBy(col("h"))
      val grp = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("idx"))
      val spanned = wins
        .withColumn("mn", min(col("doc_id")).over(wH))
        .withColumn("mx", max(col("doc_id")).over(wH))
        .filter(col("mn") =!= col("mx"))
        .withColumn("island", col("idx") - row_number().over(grp))
        .groupBy(col("doc_id"), col("island"))
        .agg(count(lit(1)))
        .groupBy(col("doc_id")).agg(count(lit(1)))
        .count()
      println(f"SCALE-SPAN k=$k docs=${k * n0}%7d spanned_docs=$spanned%7d " +
        f"t=${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }

    // SemDeDup + PQ shapes (x58/x59) on the scaled embedding corpus.
    // SemDeDup: cells from the quantized fit, pairs only within a
    // cell — k (cells) is scaled WITH the corpus, as a deployment
    // would, so cell population and the per-cell pair count stay flat.
    // PQ: codebook fit + code scan + 20-query ADC rank — the scan is
    // one narrow pass, so its curve must be linear in vecs.
    ks.foreach { k =>
      val corpus = scaledEmb(k)
        .cache()
      corpus.count()

      val t0 = System.nanoTime()
      val cells = 16 * k // cells scale with the corpus: bounded cell pop
      val cents = graft.ext.KMeansLite.fitQuantized(
        corpus, "vec_id", "v", cells, iters = 1)
      val assigned = corpus.select(col("vec_id"), col("v"),
        graft.ext.KMeansLite.assign(col("v"), cents).as("cell"))
      val pairs = assigned
        .select(col("cell"), col("vec_id").as("id_a"), col("v").as("va"))
        .hint("merge")
        .join(assigned.select(col("cell"), col("vec_id").as("id_b"),
          col("v").as("vb")), "cell")
        .filter(col("id_a") < col("id_b"))
        .filter(round(graft.ext.Similarity.cosine(col("va"), col("vb")), 6)
          >= lit(0.99)).count()
      val tSem = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val m = 4; val sub = 16
      val pqCents = (0 until m).map { j =>
        graft.ext.KMeansLite.fitQuantized(
          corpus.select(col("vec_id"),
            slice(col("v"), j * sub + 1, sub).as("v")),
          "vec_id", "v", 16, iters = 1)
      }
      val codes = corpus.select(
        col("vec_id").as("neighbor_id") +:
          (0 until m).map(j => graft.ext.KMeansLite.assign(
            slice(col("v"), j * sub + 1, sub), pqCents(j)).as(s"code_$j")): _*)
      val probes = corpus.filter(col("vec_id") < 20).select(
        col("vec_id").as("query_id") +:
          (0 until m).map(j => graft.ext.KMeansLite.cellDistances(
            slice(col("v"), j * sub + 1, sub), pqCents(j)).as(s"lut_$j")): _*)
      val adc = round((0 until m)
        .map(j => element_at(col(s"lut_$j"), col(s"code_$j") + 1))
        .reduce(_ + _), 6)
      val wR = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("adc6"), col("neighbor_id"))
      val topk = codes.crossJoin(broadcast(probes))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("adc6", adc)
        .withColumn("rnk", row_number().over(wR))
        .filter(col("rnk") <= 5).count()
      val tPq = (System.nanoTime() - t1) / 1e9

      println(f"SCALE-SEMPQ k=$k vecs=${k * e0}%7d semdedup_pairs=$pairs%8d " +
        f"topk=$topk%4d semdedup=$tSem%7.2fs pq=$tPq%7.2fs")
      corpus.unpersist()
    }

    // kNN graph (the x73 shape, round-8 task #4): cells scale WITH
    // the corpus (cells ∝ vecs) so cell population — and therefore
    // candidates per node — stays flat, making the pairwise stage
    // O(n·cell); the output is exactly n·topK rows by construction
    // (minus nodes in singleton cells). The curve must track vecs
    // ~linearly; edge count is the output-size accounting.
    ks.foreach { k =>
      val corpus = scaledEmb(k).cache()
      corpus.count()
      val t0 = System.nanoTime()
      val edges = graft.ext.AnnIndex.knnGraph(corpus, k = 16 * k, topK = 5)
        .count()
      println(f"SCALE-KNNG k=$k vecs=${k * e0}%7d cells=${16 * k}%4d " +
        f"edges=$edges%8d t=${(System.nanoTime() - t0) / 1e9}%7.2fs")
      corpus.unpersist()
    }

    // BPE merge rounds (the x74 shape, round-8 task #4): per round
    // one partial-aggregated pair-count shuffle, a 1-row argmax
    // broadcast, and a narrow per-document array rewrite — time must
    // track token mass ~linearly in k. Output accounting: token mass
    // before/after the 3 rounds (the difference is the total merged
    // occurrence count across rounds).
    ks.foreach { k =>
      val toks = scaledDocs(k)
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
        .cache()
      val before = toks.agg(sum(size(col("toks")))).head().getLong(0)
      val t0 = System.nanoTime()
      val after = graft.ext.BpeMerge.mergeRounds(toks, 3)
        .agg(sum(size(col("toks")))).head().getLong(0)
      println(f"SCALE-BPE k=$k docs=${k * n0}%7d tokens_before=$before%9d " +
        f"tokens_after=$after%9d merged=${before - after}%8d " +
        f"t=${(System.nanoTime() - t0) / 1e9}%7.2fs")
      toks.unpersist()
    }

    // Bloom decontamination (the x76 shape, round-10): the REFERENCE
    // corpus grows k× too, and the claim under test is that the
    // filter stays bounded — n_bits must saturate at ≤ 65536 (2^16
    // slots) no matter how many grams the reference holds, while the
    // probe side's cost tracks its own size linearly. A reference
    // equi-join design (the x24 shape) would instead ship a
    // vocabulary growing with k.
    ks.foreach { k =>
      val corpus = scaledDocs(k)
      val grams = corpus.withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= 5)
        .select(col("doc_id"),
          explode(Text.wordShingles(col("t"), 5)).as("gram"))
      val t0 = System.nanoTime()
      val bits = graft.ext.Bloom.build(
        grams.filter(col("doc_id") % 10 === 0).select(col("gram")).distinct(),
        col("gram"), j = 4).cache()
      val nBits = bits.count()
      val flagged = graft.ext.Bloom.test(
        grams.select(col("doc_id"), col("gram")), col("gram"), bits, j = 4)
        .filter(col("bloom_hit")).count()
      println(f"SCALE-BLOOM k=$k docs=${k * n0}%7d bits=$nBits%6d " +
        f"flagged=$flagged%9d t=${(System.nanoTime() - t0) / 1e9}%7.2fs")
      bits.unpersist()
    }

    // HLL sketch (the x77 shape, round-10): distinct-gram cardinality
    // grows with k (rotated copies mint new shingles), but the
    // aggregate's shuffle is register-bounded — the probe reports the
    // register-row count actually shuffled (≤ 64 per lang at ANY k)
    // next to the growing estimate; time tracks the hashing scan
    // linearly.
    ks.foreach { k =>
      val corpus = scaledDocs(k)
      val grams = corpus.withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= 3)
        .select(explode(Text.wordShingles(col("t"))).as("gram"))
      val t0 = System.nanoTime()
      val regs = grams.withColumn("h", graft.ext.Hll.h32(col("gram")))
        .select(graft.ext.Hll.regIndex(col("h")).as("idx"),
          graft.ext.Hll.rho(col("h")).as("rho"))
        .groupBy(col("idx")).agg(max(col("rho")).as("m_rho")).cache()
      val nRegs = regs.count()
      val est = regs.agg(
        graft.ext.Hll.estimate(
          sum(graft.ext.Hll.presentWeight("m_rho")) +
            (lit(graft.ext.Hll.M.toLong) - count(lit(1))) *
              lit(graft.ext.Hll.EmptyWeight),
          lit(graft.ext.Hll.M.toLong) - count(lit(1))))
        .head().getDouble(0)
      println(f"SCALE-HLL k=$k docs=${k * n0}%7d reg_rows=$nRegs%3d " +
        f"estimate=$est%12.1f t=${(System.nanoTime() - t0) / 1e9}%7.2fs")
      regs.unpersist()
    }

    // Power iteration (the x82 shape, round-10): per round one narrow
    // map + one d-row aggregate, driver state d longs — time must
    // track vecs linearly and the direction's unit norm is the
    // correctness accounting.
    ks.foreach { k =>
      val corpus = scaledEmb(k).cache()
      corpus.count()
      val t0 = System.nanoTime()
      val v = graft.ext.PowerIter.fit(corpus, "v", dims = 64, iters = 2)
      val norm = math.sqrt(v.map(x => x * x).sum)
      println(f"SCALE-PIT k=$k vecs=${k * e0}%7d norm=$norm%8.6f " +
        f"t=${(System.nanoTime() - t0) / 1e9}%7.2fs")
      corpus.unpersist()
    }

    // Containment join (the x84 shape, round-11): quotes and corpus
    // both grow k×, but growth here is FRESH content (copy c prefixes
    // every token with c<c>_ — a disjoint vocabulary per copy), the
    // way a real corpus grows; the rotated-copy builder above would
    // instead replicate every trigram k× and model a 100%-duplicated
    // corpus. Claim under test: candidates come ONLY from the
    // opening-trigram posting join, so candidates-per-quote stays FLAT
    // as the corpus grows (posting list length per block key is set by
    // content density, not corpus size) and total candidates, the only
    // corpus-sized stage, stays corpus-linear — never all-pairs
    // (quotes × docs would be k²).
    ks.foreach { k =>
      val corpus = (0 until k).map { c =>
        docs.select((col("doc_id") + c * 1000000L).as("doc_id"),
          when(lit(c) === 0, col("text")).otherwise(
            regexp_replace(col("text"), "(\\S+)", s"c${c}_$$1")).as("text"))
      }.reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism)
      val withTk = corpus.withColumn("tk", Text.tokens(col("text")))
      val d = withTk.filter(size(col("tk")) >= 3)
        .select(col("doc_id"), Text.wordShingles(col("tk")).as("tri"))
      val q = withTk.filter(col("doc_id") % 2 === 0 && size(col("tk")) >= 30)
        .select((col("doc_id") + 20000000L).as("quote_id"),
          Text.wordShingles(expr("slice(tk, 1, 30)")).as("qtri"),
          concat_ws(" ", element_at(col("tk"), 1),
            element_at(col("tk"), 2), element_at(col("tk"), 3)).as("block"))
      val nQuotes = q.count()
      val t0 = System.nanoTime()
      val cand = q.join(
        d.select(col("doc_id"), explode(col("tri")).as("block")), "block")
        .join(d, "doc_id").cache()
      val nCand = cand.count()
      val nMatch = cand
        .filter(round(size(array_intersect(col("qtri"), col("tri")))
          .cast("double") / size(col("qtri")).cast("double"), 4) >= 0.9)
        .count()
      println(f"SCALE-CONTAIN k=$k docs=${k * n0}%7d quotes=$nQuotes%6d " +
        f"cand=$nCand%8d cand_per_quote=${nCand.toDouble / nQuotes}%7.1f " +
        f"matches=$nMatch%6d t=${(System.nanoTime() - t0) / 1e9}%7.2fs")
      cand.unpersist()
    }

    // BPE encode (the x85 shape, round-11): merge rules trained ONCE
    // on the original docs, then applied to the k× corpus — encode
    // cost must track the corpus linearly (it is k narrow rewrites),
    // completely independent of training-corpus size.
    val encRules = graft.ext.BpeMerge.collectRules(
      graft.ext.BpeMerge.trainPairs(
        docs.select(col("doc_id"), Text.tokens(col("text")).as("toks")),
        rounds = 3))
    ks.foreach { k =>
      val corpus = scaledDocs(k)
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      val t0 = System.nanoTime()
      val nTok = graft.ext.BpeMerge.encodeFrozen(corpus, encRules)
        .agg(sum(size(col("toks")))).head().getLong(0)
      println(f"SCALE-BPEENC k=$k docs=${k * n0}%7d tokens_out=$nTok%9d " +
        f"t=${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }

    // Shard assignment (the x86 shape, round-11): the 2-level bucketed
    // global rank must stay corpus-linear with its ONE bounded global
    // window — the probe prints the bucket-offset row count actually
    // windowed (≤ 256 at any k) beside the growing shard count.
    ks.foreach { k =>
      val corpus = scaledDocs(k).select(col("doc_id"))
      val t0 = System.nanoTime()
      val assigned = graft.ext.Shards.assign(corpus, col("doc_id"),
        docsPerShard = 100, seed = 42).cache()
      val nShards = assigned.agg(countDistinct(col("shard")))
        .head().getLong(0)
      val nBuckets = assigned.agg(
        countDistinct(substring(col("skey"), 1, 2))).head().getLong(0)
      println(f"SCALE-SHARD k=$k docs=${k * n0}%7d shards=$nShards%5d " +
        f"offset_rows=$nBuckets%4d t=${(System.nanoTime() - t0) / 1e9}%7.2fs")
      assigned.unpersist()
    }

    // CDC chunking (the x90 shape, round-11): chunking is a narrow
    // map — time must track the corpus linearly — and the dup-chunk
    // mass the rotated near-dup copies create must GROW with k (the
    // whole point of content-defined boundaries: cross-copy tails
    // still align), while only the 32-byte-hash aggregate shuffles.
    ks.foreach { k =>
      val corpus = scaledDocs(k)
      val t0 = System.nanoTime()
      val ch = corpus.select(col("doc_id"),
        explode(graft.ext.ContentChunks.chunks(col("text"), 8)).as("c"))
        .select(col("doc_id"), md5(col("c")).as("h"))
      val agg = ch.groupBy(col("h"), col("doc_id"))
        .agg(count(lit(1)).as("cc"))
        .groupBy(col("h")).agg(count(lit(1)).as("nd"))
        .agg(count(lit(1)).as("n_hashes"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_dup"))
        .head()
      println(f"SCALE-CDC k=$k docs=${k * n0}%7d " +
        f"hashes=${agg.getLong(0)}%8d dup_hashes=${agg.getLong(1)}%7d " +
        f"t=${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    } // end !probeR12Only

    // SPARK_GRAFT_PROBE_SKIP_R12=1 skips the round-12 receipt
    // sections (SHARDK/AUCFLOOR/QTFLOOR/BPEDEPTH) so a single env-
    // gated section (IMG/DSIR/WINNOW/...) can run alone.
    if (!sys.env.contains("SPARK_GRAFT_PROBE_SKIP_R12")) {
    // Shard prefix-length invariance (round-12, r11 verdict task 5):
    // the 16^k bucket fan-out claim, probed — prefixLen 2 (256
    // buckets) and 3 (4096 buckets) must produce IDENTICAL
    // (doc, shard, position) assignments at every corpus size (the
    // union-distinct count equals the corpus count iff the two
    // assignments agree row for row), with comparable time: the rank
    // is the same two-level plan at either fan-out.
    ks.foreach { k =>
      val corpus = scaledDocs(k).select(col("doc_id")).cache()
      val n = corpus.count()
      def assigned(p: Int) = graft.ext.Shards.assign(
        corpus, col("doc_id"), docsPerShard = 100, seed = 42,
        rankOffset = 0L, prefixLen = p)
        .select(col("doc_id"), col("shard"), col("position"))
      val t2 = System.nanoTime()
      val a2 = assigned(2).cache(); a2.count()
      val dt2 = (System.nanoTime() - t2) / 1e9
      val t3 = System.nanoTime()
      val a3 = assigned(3).cache(); a3.count()
      val dt3 = (System.nanoTime() - t3) / 1e9
      val agree = a2.unionByName(a3).distinct().count() == n
      println(f"SCALE-SHARDK k=$k docs=$n%7d identical=$agree " +
        f"t_k2=$dt2%6.2fs t_k3=$dt3%6.2fs")
      require(agree, s"prefixLen 2 vs 3 assignment mismatch at k=$k")
      corpus.unpersist(); a2.unpersist(); a3.unpersist()
    }

    // x91 AUC / x89 quantile-sketch floor receipts (round-12, r11
    // verdict task 6): both operators are sub-second at sf1 and
    // exempted from the >2× rule as scheduling-floor-dominated — this
    // probe makes the exemption evidence. The scaled (score, label) /
    // value inputs are WRITTEN to parquet first and both engines read
    // the same file (scripts/floor_duck.py times DuckDB's recompute on
    // it): engine time should stay ~flat across 1×/4×/16× (the floor),
    // while a corpus-linear engine grows.
    ks.foreach { k =>
      val pts = (0 until k).map { c =>
        Tables(spark, sfDir, "embeddings").select(
          floor(graft.ext.Similarity.norm2(
            graft.ext.Similarity.toDoubleArray(col("embedding")))
            * 1e6 * (1.0 + c / 1000.0) + 0.5).cast("long").as("s"),
          (col("label") % 2 === 0).as("pos"))
      }.reduce(_ unionByName _)
      val path = s"target/scale_auc_k$k"
      pts.write.mode("overwrite").parquet(path)
      val in = spark.read.parquet(path)
      val t0 = System.nanoTime()
      val r = graft.ext.Auc.auc(in, col("s"), col("pos")).head()
      val dt = (System.nanoTime() - t0) / 1e9 // capture BEFORE the row count
      println(f"SCALE-AUCFLOOR k=$k rows=${in.count()}%8d " +
        f"auc=${r.getDouble(3)}%8.6f t=$dt%6.2fs")
    }
    ks.foreach { k =>
      val vals = scaledDocs(k)
        .select(length(col("text")).cast("long").as("n_chars"))
      val path = s"target/scale_qtile_k$k"
      vals.write.mode("overwrite").parquet(path)
      val in = spark.read.parquet(path)
      val qPpm = Seq(250000L, 500000L, 750000L, 900000L, 990000L)
      val t0 = System.nanoTime()
      val n = graft.ext.Quantiles.quantiles(
        graft.ext.Quantiles.histogram(in, col("n_chars"), 64L), 64L, qPpm)
        .count()
      val dt = (System.nanoTime() - t0) / 1e9 // capture BEFORE the row count
      println(f"SCALE-QTFLOOR k=$k rows=${in.count()}%8d qrows=$n " +
        f"t=$dt%6.2fs")
    }

    // Hybrid-retrieval serve (round-12, the X136/X137 shape): index a
    // k× corpus once, then serve the SAME 8 queries against every
    // index size. Receipts per k: output stays exactly 8×top-10
    // (leg truncation before the fuse), the sparse leg's candidate
    // mass (matched postings rows for the query term set) grows with
    // the corpus while the FUSED row count does not, and serve time
    // tracks the candidate mass, never the index size. Indexes land
    // on parquet per k (the BPEFAST probe lesson: in-memory
    // checkpoint blocks inflate every later section's timings).
    ks.foreach { k =>
      val idx = s"target/scale_hybrid_k$k"
      val sd = scaledDocs(k)
      val se = (0 until k).map { c =>
        Tables(spark, sfDir, "embeddings")
          .select((col("vec_id") + c * 1000000L).as("doc_id"),
            transform(
              graft.ext.Similarity.toDoubleArray(col("embedding")),
              x => x * (1.0 + c / 1000.0)).as("v"))
      }.reduce(_ unionByName _)
      val cents: Seq[Seq[Double]] = se.filter(col("doc_id") < 4)
        .orderBy(col("doc_id")).select(col("v")).collect()
        .map(_.getSeq[Double](0).toSeq).toSeq
      graft.streaming.StreamRetrieve.buildIndex(sd, se, cents, idx)
      val wQt = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("tf").desc, col("w"))
      val queries = sd.filter(col("doc_id") < 8)
        .select(col("doc_id").as("query_id"),
          explode(Text.tokens(col("text"))).as("w"))
        .groupBy(col("query_id"), col("w")).agg(count(lit(1)).as("tf"))
        .withColumn("trnk", row_number().over(wQt))
        .filter(col("trnk") <= 5)
        .groupBy(col("query_id"))
        .agg(collect_list(col("w")).as("qterms"))
        .join(se.select(col("doc_id").as("query_id"), col("v").as("qv")),
          "query_id")
        .localCheckpoint()
      val t0 = System.nanoTime()
      val out = graft.streaming.StreamRetrieve.serveBatch(
        spark, queries, idx, cents, nProbe = 2, legK = 50, topK = 10)
        .cache()
      val nOut = out.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val nCand = spark.read.parquet(s"$idx/postings")
        .join(broadcast(queries
          .select(explode(col("qterms")).as("w")).distinct()), "w")
        .count()
      println(f"SCALE-HYBRID k=$k docs=${k * n0}%7d fused_out=$nOut%4d " +
        f"sparse_cand=$nCand%8d t=$dt%6.2fs")
      require(nOut == 80L, s"fused output not 8x10 at k=$k")
      out.unpersist()
    }

    // Native-vs-HOF frozen encode (round-12 stretch): encodeFrozen
    // nests k rewrite layers into the plan, so its cost has a
    // PER-RULE plan-machinery term that grows with depth; the native
    // BpeEncodeRules expression holds the whole rule list in one
    // expression. Same output (token totals asserted equal here,
    // bit-equality in RoundTwelveSpec); the curve shows where the
    // HOF form hits the depth wall and the native form keeps the
    // per-rule cost flat.
    {
      val toksDf = docs
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
        .localCheckpoint()
      val allRules = graft.ext.BpeMerge.topPairs(toksDf, 200)
        .orderBy(col("r")).collect()
        .map(row => (row.getString(0), row.getString(1))).toSeq
      Seq(3, 40, 200).foreach { r =>
        val rules = allRules.take(r)
        val t0 = System.nanoTime()
        val nN = graft.ext.BpeMerge.encodeNative(toksDf, rules)
          .agg(sum(size(col("toks")))).head().getLong(0)
        val dtN = (System.nanoTime() - t0) / 1e9
        // the HOF leg only to depth 40 — past that its analysis cost
        // alone is the wall the native form exists to remove
        val (nF, dtF) = if (r <= 40) {
          val t1 = System.nanoTime()
          val n = graft.ext.BpeMerge.encodeFrozen(toksDf, rules)
            .agg(sum(size(col("toks")))).head().getLong(0)
          (n, (System.nanoTime() - t1) / 1e9)
        } else (nN, -1.0)
        require(nF == nN, s"native vs frozen token totals differ at r=$r")
        println(f"SCALE-BPENATIVE rules=$r%3d native=$dtN%6.2fs " +
          f"frozen=$dtF%6.2fs tokens=$nN%9d")
      }
    }

    } // end !SKIP_R12

    // x101 Naive Bayes training-state/serve curve — env-gated
    // (SPARK_GRAFT_PROBE_NB=1). The two claims that matter at 100 TB,
    // measured: (1) TRAINING STATE IS VOCABULARY-BOUNDED — the k×
    // corpus (token-rotated copies: more text, same type inventory,
    // the Heaps-plateau regime a saturated natural corpus reaches)
    // trains through a model whose row count stays CONSTANT while the
    // corpus-shaped count pass grows with k; (2) SERVING IS LINEAR
    // WITH CONSTANT MODEL — the frozen narrow-map scorer re-scores
    // the k× corpus with the same map literal, no per-k model cost.
    // Labels are id-parity (cost curve only — model content is
    // irrelevant to the shape).
    if (sys.env.contains("SPARK_GRAFT_PROBE_NB")) {
      ks.foreach { k =>
        val corpus = scaledDocs(k)
          .withColumn("label", (col("doc_id") % 2 === 0).cast("long"))
          .withColumn("t", Text.tokens(col("text")))
          .select(col("doc_id"), col("label"), col("t"))
          .localCheckpoint() // tokenize once, off both timed paths
        val t0 = System.nanoTime()
        val (model, consts) = NaiveBayes.train(corpus, "t", "label")
        val frozen = graft.streaming.StreamNb.freeze(model, consts)
        val dtTrain = (System.nanoTime() - t0) / 1e9
        val vocab = frozen.llr.size
        val t1 = System.nanoTime()
        val nPos = graft.streaming.StreamNb.score(corpus, col("t"), frozen)
          .agg(sum(when(col("pred"), 1L).otherwise(0L)).as("p"))
          .head().getLong(0)
        val dtScore = (System.nanoTime() - t1) / 1e9
        println(f"SCALE-NB k=$k docs=${k * n0}%7d vocab=$vocab%6d " +
          f"train=$dtTrain%6.2fs score=$dtScore%6.2fs npos=$nPos")
      }
    }

    // x98 weighted-MinHash candidate-suppression curve — env-gated
    // (SPARK_GRAFT_PROBE_WMH=1). Corpus per k: k×n0 docs with
    // DISJOINT content (every token prefixed with the copy tag, so
    // cross-copy shingles never collide) ∪ a truncated copy of each,
    // stamped with the x98 footer. True candidate = a doc and its own
    // stamped copy; everything else sharing only the footer is
    // spurious. At the same 16-hash/4-band budget, the raw signature
    // lets the footer hijack minima — spurious band candidates grow
    // QUADRATICALLY in the stamped count. The df-cut (idfWeight's 0
    // tier) deletes the footer from the weighted signature, so
    // footer-only pairs share NOTHING and spurW is the md5-collision
    // rate, i.e. 0 — at every k, with no correlation caveat.
    //
    // MEASURED NEGATIVE RESULT kept on record (PLANS.md round-12):
    // the first cut of this probe demoted the footer to weight 1
    // instead of deleting it, expecting per-band collision J_repl⁴ ≈
    // 60× below raw. The measurement came back INVERTED (spurW 6×
    // spurR) because per-pair J^rows analysis silently assumes
    // independent minima: a corpus-wide shared subset has CONSTANT
    // element hashes, so one unlucky-small footer hash captures the
    // signature entry of most stamped docs at once (distinct-value
    // counts per hash dropped to 29/500 on two of 16 hashes). Which
    // leg suffers more is pure hash-luck; the only scale-safe fix is
    // removing the shared subset from the signature — weight 0.
    if (sys.env.contains("SPARK_GRAFT_PROBE_WMH")) {
      val boiler = graft.queries.ExtQueries.Boilerplate
      ks.foreach { k =>
        val tagged = (0 until k).map { c =>
          docs.select((col("doc_id") + c * 1000000L).as("doc_id"),
            array_join(transform(Text.tokens(col("text")),
              t => concat(lit(s"k$c"), t)), " ").as("text"))
        }.reduce(_ unionByName _)
        val toks = Text.tokens(col("text"))
        val stamped = tagged.select(
          (col("doc_id") + 50000000L).as("doc_id"),
          concat(array_join(slice(toks, lit(1), size(toks) - 3), " "),
            lit(" " + boiler)).as("text"))
        val corpus = tagged.unionByName(stamped)
          .repartition(spark.sparkContext.defaultParallelism)
        val sh = corpus.withColumn("t", Text.tokens(col("text")))
          .filter(size(col("t")) >= 3)
          .select(col("doc_id"), Text.wordShingles(col("t")).as("s"))
          .localCheckpoint() // one tokenize pass shared by both legs
        def split(pairs: org.apache.spark.sql.DataFrame): (Long, Long) = {
          val c = pairs.cache()
          val true_ = c.filter(col("id_b") - col("id_a") === 50000000L).count()
          val all = c.count()
          c.unpersist()
          (true_, all - true_)
        }
        val t0 = System.nanoTime()
        val ws = Dedup.weightedShingles(sh, "doc_id", "s").localCheckpoint()
        val (trueW, spurW) = split(Dedup.bandedPairs(ws, "id", "exp", 16, 4))
        val dtW = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val (trueR, spurR) = split(Dedup.bandedPairs(sh, "doc_id", "s", 16, 4))
        val dtR = (System.nanoTime() - t1) / 1e9
        val supp = spurR.toDouble / math.max(spurW, 1L)
        println(f"SCALE-WMH k=$k docs=${2 * k * n0}%7d " +
          f"trueW=$trueW%5d spurW=$spurW%7d tW=$dtW%6.2fs " +
          f"trueR=$trueR%5d spurR=$spurR%7d tR=$dtR%6.2fs supp=$supp%6.1f")
      }
    }

    // BPE training depth (round-12, r11 verdict task 2): per-round
    // cost of the full-recount training loop out to production-ish
    // depth — env-gated (SPARK_GRAFT_BPE_DEPTH=<rounds>) because a
    // 50-100 round run is minutes. Flat per-round cost → a 30k-merge
    // vocabulary costs rounds × per-round (the projection PLANS.md
    // states); a GROWING per-round cost would mean re-execution is
    // leaking through the per-round checkpoints.
    val depthRounds = sys.env.getOrElse("SPARK_GRAFT_BPE_DEPTH", "0").toInt
    if (depthRounds > 0) {
      var cur = docs
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
        .localCheckpoint()
      val times = (1 to depthRounds).map { r =>
        val t0 = System.nanoTime()
        val p = graft.ext.BpeMerge.topPair(cur)
        cur = graft.ext.BpeMerge.applyPair(cur, p).localCheckpoint()
        val dt = (System.nanoTime() - t0) / 1e9
        if (r <= 3 || r % 10 == 0)
          println(f"SCALE-BPEDEPTH round=$r%3d t=$dt%6.2fs")
        dt
      }
      println(f"SCALE-BPEDEPTH rounds=$depthRounds " +
        f"total=${times.sum}%7.1fs " +
        f"first10avg=${times.take(10).sum / math.min(10, depthRounds)}%5.2fs " +
        f"last10avg=${times.takeRight(10).sum / math.min(10, depthRounds)}%5.2fs")
    }

    // FAST-TRAINER corpus-independence (round-12; the trainFast
    // receipt): k EXACT-COPY corpora (ids shifted, text identical —
    // the duplicated/boilerplate mass a web corpus actually has), the
    // recount loop vs the incremental type-table trainer at the same
    // depth, rule equality asserted. The recount loop re-aggregates
    // k× the token volume EVERY round; the fast trainer pays the k×
    // volume once (the typeTable aggregate) and then each round
    // touches only the vocabulary-bounded type/pair tables — per-k
    // cost should be ~flat for fast, ~linear-in-k for recount.
    // Env-gated (SPARK_GRAFT_BPE_FAST=<rounds>).
    // Methodology note (measured): holding the k× tokenized corpus
    // as in-memory checkpoint blocks inflates EVERY subsequent
    // timing at k=16 (block-manager/GC pressure — the fast loop's
    // own inputs are bit-identical across k, yet measured 3× slower
    // under the resident corpus), so the corpus goes to PARQUET and
    // both trainers read from disk — which is also what a 100 TB
    // vocabulary build actually does. Run one k per JVM for clean
    // pairing.
    val fastRounds = sys.env.getOrElse("SPARK_GRAFT_BPE_FAST", "0").toInt
    if (fastRounds > 0) {
      ks.foreach { k =>
        val dir = s"/tmp/probe_bpefast_k$k"
        val synth = sys.env.contains("SPARK_GRAFT_BPEFAST_SYNTH")
        (0 until (if (synth) 1 else k)).map(c =>
          docs.select((col("doc_id") + c * 1000000L).as("doc_id"),
            col("text")))
          .reduce(_ unionByName _)
          .repartition(spark.sparkContext.defaultParallelism)
          .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
          .write.mode("overwrite").parquet(dir)
        val toksDf = spark.read.parquet(dir).select(col("toks"))
        // the ONE corpus-shaped job (typeTable aggregate) timed apart
        // from the round loop: in production it amortizes over the
        // full 30k-round vocabulary build
        val t1 = System.nanoTime()
        val types = (if (synth)
          graft.ext.BpeMerge.typeTable(toksDf)
            .withColumn("w", col("w") * k)
        else graft.ext.BpeMerge.typeTable(toksDf)).localCheckpoint()
        val dtTypes = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        val fast = graft.ext.BpeMerge.collectRules(
          graft.ext.BpeMerge.trainFast(types, fastRounds))
        val dtFast = (System.nanoTime() - t2) / 1e9
        val t0 = System.nanoTime()
        val slow = graft.ext.BpeMerge.collectRules(
          graft.ext.BpeMerge.trainPairs(toksDf, fastRounds))
        val dtSlow = (System.nanoTime() - t0) / 1e9
        require(fast == slow,
          s"fast/recount rule sequences diverge at k=$k")
        val nTypes = types.count()
        println(f"SCALE-BPEFAST k=$k%2d docs=${k * n0}%7d " +
          f"types=$nTypes%7d rounds=$fastRounds " +
          f"typeagg=$dtTypes%6.2fs " +
          f"recount=$dtSlow%7.2fs fastrounds=$dtFast%7.2fs " +
          f"perround_recount=${dtSlow / fastRounds}%5.2fs " +
          f"perround_fast=${dtFast / fastRounds}%5.2fs")
      }
    }

    // x111 winnowing curve — env-gated (SPARK_GRAFT_PROBE_WINNOW=1).
    // The two claims: (1) LINEAR — fingerprinting cost per doc is flat
    // as the corpus scales (narrow hashing + doc-keyed windows, no
    // cross-doc work before the fp_h exchange); (2) the DETECTION
    // GROWS with the planted cross-copy near-dup mass — scaledDocs's
    // rotated copies share their full token stream up to the rotation
    // boundary, so at k≥2 every doc shares fingerprints with its
    // rotated twins (the MOSS guarantee under cyclic shift), while at
    // k=1 sharing is only vocabulary collision.
    // x112 DSIR curve — env-gated (SPARK_GRAFT_PROBE_DSIR=1). The two
    // claims: (1) MODEL STATE IS CONSTANT — λ is exactly 64 rows at
    // every corpus size (feature hashing is the state bound, the
    // paper's point); (2) the frozen-λ narrow-map serve is linear
    // with a constant literal (the StreamNb shape). Target = copy 0
    // (the un-rotated slice), so the target/raw contrast is stable
    // as k grows.
    if (sys.env.contains("SPARK_GRAFT_PROBE_DSIR")) {
      ks.foreach { k =>
        val corpus = scaledDocs(k)
          .withColumn("t", Text.tokens(col("text")))
          .filter(size(col("t")) >= 2)
          .localCheckpoint() // tokenize off the timed paths
        val t0 = System.nanoTime()
        val feats = corpus.select(col("doc_id"),
          explode(graft.ext.Dsir.featureArray(col("t"))).as("f"))
          .withColumn("b", graft.ext.Dsir.bucket(col("f")))
        val lam = graft.streaming.StreamDsir.freeze(
          graft.ext.Dsir.lambdaTable(feats, col("doc_id") < 1000000L))
        val dtFit = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val kept = graft.streaming.StreamDsir
          .weight(corpus, col("t"), lam, 0L)
          .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n"))
          .head().getLong(0)
        val dtServe = (System.nanoTime() - t1) / 1e9
        println(f"SCALE-DSIR k=$k%2d docs=${k * n0}%7d " +
          f"lambda_rows=${lam.length}%3d fit=$dtFit%6.2fs " +
          f"serve=$dtServe%6.2fs kept=$kept%7d")
      }
    }

    // x167 image-dHash curve — env-gated (SPARK_GRAFT_PROBE_IMG=1),
    // round-12 verdict task 6: the banding claim (banded == brute,
    // candidates linear) is spec-proven at 41 payloads; probe it at k×
    // synthetic JPEG rasters with planted perturbed twins. Corpus per
    // k: k·2000 base 128×96 images (smooth sinusoid + blockwise
    // texture — photograph-like content whose grid-cell means carry
    // real margins under q90) + one twin each (uniform brightness +6,
    // then a SECOND lossy q90 encode). Claims: (1) decode+hash cost
    // per image flat (the mapPartitions batch shape); (2) banded
    // candidate MASS ~linear in the corpus — THE CLAIM THAT FAILED
    // for the original 64-bit/16-bit-band hash (mass ∝ n²/2¹⁶-class
    // random collisions, measured 63k→254k→1.0M at 1×/2×/4× even on a
    // diversified fixture) and drove the 256-bit/64-bit-band upgrade;
    // (3) twin recall pinned at 100% — every planted twin lands
    // within Hamming ≤ 3 of 256 and the pigeonhole catches it.
    if (sys.env.contains("SPARK_GRAFT_PROBE_IMG")) {
      import graft.ext.{ImageHash, Jpeg, MultiModal, Ppm}
      import spark.implicits._
      val TwinShift = 10000000L
      ks.foreach { k =>
        val n = k * 2000
        val media = spark.range(n).as[Long].mapPartitions { it =>
          it.flatMap { id =>
            val w = 128; val h = 96
            val fx = 1.0 + (id % 3) * 0.5
            val fy = 1.0 + ((id / 3) % 3) * 0.5
            val phase = (id % 1000) * 0.00628
            def raster(lift: Int): Ppm.Image = {
              val px = new Array[Byte](w * h * 3)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  // block texture DOMINATES the sinusoid: the dHash
                  // must differ across ids, or the 9-shape gradient
                  // family concentrates the bands and the candidate
                  // mass goes quadratic — which is a statement about
                  // LOW-ENTROPY corpora (mass ∝ Σ bucket²), not about
                  // the banding; the probe's linearity claim is for a
                  // corpus of DISTINCT images, so the fixture must be
                  // one
                  val block = (((x / 2) * 73L + (y / 2) * 131L +
                    id * 997L) * 2654435761L >>> 27) % 91 - 45
                  val base = 128.0 + 40 * math.sin(
                    2 * math.Pi * (fx * x / w + fy * y / h) + phase) + block
                  var ch = 0
                  while (ch < 3) {
                    val v = math.max(0, math.min(255,
                      math.round(base + ch * 3 + lift).toInt))
                    px((y * w + x) * 3 + ch) = v.toByte
                    ch += 1
                  }
                  x += 1
                }
                y += 1
              }
              Ppm.Image(w, h, px)
            }
            Seq(
              MultiModal.MediaRecord(id, "image/jpeg", w, h,
                Jpeg.encode(raster(0), 90)),
              MultiModal.MediaRecord(id + TwinShift, "image/jpeg", w, h,
                Jpeg.encode(raster(6), 90)))
          }
        }.localCheckpoint() // payload gen off the timed decode path
        val t0 = System.nanoTime()
        val hashes = ImageHash.hashes(media).localCheckpoint()
        val nHashes = hashes.count()
        val dtHash = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val cand = ImageHash.bandCandidates(hashes)
          .agg(count(lit(1)).as("mass"),
            sum(when(col("dist") <= 3 &&
              col("id_b") === col("id_a") + TwinShift, 1L).otherwise(0L))
              .as("twin_hits"))
          .head()
        val dtPairs = (System.nanoTime() - t1) / 1e9
        // twin_hits counts (pair, band) rows; recall needs distinct
        // pairs — recompute through the collapsed output
        val recall = ImageHash.nearDupPairs(hashes, 3)
          .filter(col("id_b") === col("id_a") + TwinShift)
          .count()
        println(f"SCALE-IMGDHASH k=$k%2d imgs=$nHashes%7d " +
          f"hash=$dtHash%6.2fs perimg_us=${dtHash * 1e6 / nHashes}%7.1f " +
          f"candmass=${cand.getLong(0)}%9d join=$dtPairs%6.2fs " +
          f"twins=$recall%6d/${n}%6d")
      }
    }

    if (sys.env.contains("SPARK_GRAFT_PROBE_WINNOW")) {
      ks.foreach { k =>
        val corpus = scaledDocs(k)
          .withColumn("t", Text.tokens(col("text")))
          .localCheckpoint() // tokenize off the timed path
        val t0 = System.nanoTime()
        val summary = graft.ext.Winnow.summary(
          graft.ext.Winnow.fingerprints(corpus, "t", 4, 5))
          .agg(count(lit(1)).as("docs"),
            sum(col("n_fp")).as("nfp"),
            sum(when(col("share_ppm") >= 500000L, 1L).otherwise(0L))
              .as("ndup"))
          .head()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"SCALE-WINNOW k=$k%2d docs=${summary.getLong(0)}%7d " +
          f"nfp=${summary.getLong(1)}%9d dup=${summary.getLong(2)}%7d " +
          f"dt=$dt%6.2fs perdoc_us=${dt * 1e6 / summary.getLong(0)}%7.1f")
      }
    }
    spark.stop()
  }
}
