package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Bloom, BradleyTerry, Cms, Components, Dedup, Drift, Dsir, Hll, KMeansLite, NaiveBayes, Pack, Quantize, Redact, Sampling, Similarity, Text, Winnow, ZOrder}

/** The LLM-data-pipeline operator surface (north-star extensions), each
  * oracle-checked over the driver's `documents` / `embeddings` tables.
  *
  * The driver corpus contains no planted duplicates (500 distinct texts,
  * embeddings with max pairwise cosine ≈ 0.4), so the dedup/near-dup
  * demos first build a corpus with known duplicates: deterministic
  * id-shifted copies (exact) or mutated copies (near). The construction
  * is pure column arithmetic, reproduced verbatim in the oracle SQL.
  *
  * Scale posture per query is documented inline; the common rule is that
  * candidate generation is always an equi-join on a hash/bucket key
  * (band hash, sign bucket, IVF cell) — never an unbucketed n² cross
  * join — and the only broadcast cross join is a bounded query set.
  */
object ExtQueries {

  /** x12's per-(source,lang)-block sample cap: blocks are truncated to
    * their `X12SampleCap` lowest doc_ids before pair generation, so the
    * pair mass is ≤ blocks·(cap choose 2) — constant in corpus size.
    * Below ~cap docs/block the output is the exact pair statistics;
    * above, a deterministic-sample estimate. Surfaced as the
    * `sample_cap` output column so the regime is an explicit contract
    * (round-13 advisor: don't bury the estimator switch in a literal).
    */
  val X12SampleCap = 256

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private def toD(c: Column): Column = Similarity.toDoubleArray(c)

  /** The documents/embeddings tables are one small parquet file per SF,
    * so Spark plans a single input partition — fine for plain scans,
    * fatal for the compute-bound HOF stages (minhash md5, simhash bit
    * math, cosine folds), which would run on 1 core of 32. Spreading
    * rows across the cluster first makes those stages embarrassingly
    * parallel — at production scale the file count does this
    * automatically and the repartition becomes a no-op to delete.
    */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** The x86/x91 two-level bucketed GLOBAL rank (ascending on
    * `scoreCol` with doc_id tiebreak), for value-bounded ppm scores:
    * 4096-wide buckets cap the offset table at ≤245 rows — the only
    * unpartitioned window — while per-doc ranking runs under the
    * KEYED bucket window. Equals a plain global row_number by
    * construction; the oracles use that form.
    */
  private def bucketedRank(df: DataFrame, scoreCol: String,
      rankCol: String): DataFrame = {
    val offs = df.groupBy(expr(s"$scoreCol div 4096").as("__b"))
      .agg(count(lit(1)).as("__cnt"))
    val wO = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = offs
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wO), lit(0L)))
      .select(col("__b"), col("__off"))
    val wB = Window.partitionBy(col("__b"))
      .orderBy(col(scoreCol), col("doc_id"))
    df.withColumn("__b", expr(s"$scoreCol div 4096"))
      .join(broadcast(offsets), "__b")
      .withColumn(rankCol,
        col("__off") + row_number().over(wB).cast("long"))
      .drop("__b", "__off")
  }

  /** The k∝corpus deployment discipline (round-10 verdict task #5):
    * cells = max(1, ceil(n / 500)) — cell population stays ~500 as the
    * corpus grows, so within-cell pair work is O(n·500), never the
    * frozen-k O(n²/k) that made the sf1 demos ~100× the design's
    * work. The count is ONE driver long (the KMeansLite bounded-state
    * class); the oracle derives the same value via [[derivedKSql]].
    */
  def corpusK(n: Long): Int =
    math.max(1, math.ceil(n / 500.0).toInt)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup: corpus = documents ∪ identical copies (id+10000);
    // keep the lowest id per content hash. One window over md5(text) —
    // a single shuffle keyed on the content hash, no join.
    "x01_exact_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + 10000))
      Dedup.exactDedup(corpus, "text", "doc_id")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // MinHash/LSH near-dup pairs: corpus = documents ∪ truncated copies
    // (last 3 tokens dropped, id+10000). Candidates come ONLY from the
    // band-hash equi-join (Dedup.bandedPairs); exact trigram Jaccard is
    // then computed on candidates and thresholded.
    "x02_minhash_pairs" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = Text.tokens(col("text"))
      val mutated = docs.select(
        (col("doc_id") + 10000).as("doc_id"),
        array_join(slice(toks, lit(1), size(toks) - 3), " ").as("text"))
      val corpus = spread(docs.select(col("doc_id"), col("text")).unionByName(mutated))
      val sh = corpus
        .withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), Text.wordShingles(col("t")).as("s"))
      Dedup.nearDupPairs(sh, "doc_id", "s",
          numHashes = 12, bands = 4, threshold = 0.5)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Brute-force cosine top-k — the ANN correctness baseline. The query
    // set (10 vectors) is broadcast against the full table; ranking uses
    // a 6-decimal-rounded score with an id tie-break so order is
    // deterministic across engines.
    "x03_cosine_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), toD(col("embedding")).as("qv"))
      val c = e.select(col("vec_id").as("neighbor_id"), toD(col("embedding")).as("cv"))
      // exact integer micro-units for both the ordering key and the
      // display value: raw cosines are bit-identical across engines,
      // and floor(x·10⁶+0.5) of identical doubles is identical, while
      // round() tie-breaks diverge at representation boundaries (the
      // x15 sf1 lesson)
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_e6").desc, col("neighbor_id"))
      c.crossJoin(broadcast(q))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cos_e6",
          floor(Similarity.cosine(col("qv"), col("cv")) * 1000000 + 0.5))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .select(col("query_id"), col("rnk"), col("neighbor_id"),
          (floor(col("cos_e6") / 100.0 + 0.5) / 10000.0).as("cosine"))
        .orderBy(col("query_id"), col("rnk"))
    }),

    // Per-language corpus statistics — single hash aggregate.
    "x04_text_stats" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("lang"), col("source"), col("n_chars"),
          size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          round(avg(col("n_chars")), 2).as("avg_chars"),
          round(avg(col("n_tokens")), 2).as("avg_tokens"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("lang"))),

    // Language-ID heuristic: stopword-hit ratio over the token stream
    // (the driver corpus shares one vocabulary across langs, so this is
    // a determinism demo of the mechanism, not a model).
    // x05–x08 pre-sort the input on doc_id ([[Sorted.byKey]]) instead
    // of sorting the output: the narrow text projections preserve
    // order, the sampling pass only evaluates the scan, and the
    // per-row text work runs on all range partitions (the
    // single-row-group parquet scan would otherwise bound parallelism
    // at a handful of tasks).
    "x05_lang_id" -> ((s, dir) =>
      Sorted.byKey(t(s, dir, "documents"), col("doc_id"))
        .withColumn("toks", Text.tokens(col("text")))
        .withColumn("ratio", Text.stopwordRatio(col("toks")))
        .select(col("doc_id"), col("lang"),
          round(col("ratio"), 4).as("stop_ratio"),
          when(col("ratio") >= 0.08, lit("en")).otherwise(lit("unk"))
            .as("predicted"))),

    // Document quality scoring: length saturation + type-token ratio +
    // stopword plausibility. Pure narrow projection.
    "x06_quality_score" -> ((s, dir) =>
      Sorted.byKey(t(s, dir, "documents"), col("doc_id"))
        .withColumn("toks", Text.tokens(col("text")))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("ttr", Text.typeTokenRatio(col("toks")))
        .withColumn("stop_ratio", Text.stopwordRatio(col("toks")))
        .withColumn("mean_tok_len",
          expr("aggregate(toks, CAST(0 AS BIGINT), (a, t) -> a + length(t))")
            .cast("double") / col("n_tokens").cast("double"))
        .select(col("doc_id"), col("n_tokens"),
          round(col("ttr"), 4).as("ttr"),
          round(col("mean_tok_len"), 4).as("mean_tok_len"),
          round(col("stop_ratio"), 4).as("stop_ratio"),
          // Integer-scaled score, not round(): the 0.25/0.5-weighted sum
          // of small rationals regularly lands on exact 4th-decimal
          // midpoints where Spark (BigDecimal HALF_UP) and DuckDB
          // (multiply-based) disagree; floor(x·10⁴ + 0.5) is identical
          // whenever the input doubles are (same op order ⇒ they are).
          floor(Text.qualityScore(col("n_tokens"), col("ttr"), col("stop_ratio"))
            * 10000 + 0.5).cast("long").as("quality_e4"))),

    // Token counting (whitespace + regex lexer + chars/4 estimate) and
    // an order-sensitive rolling-hash document fingerprint.
    "x07_token_fingerprint" -> ((s, dir) =>
      Sorted.byKey(t(s, dir, "documents"), col("doc_id"))
        .withColumn("toks", Text.tokens(col("text")))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("ws_tokens"),
          size(regexp_extract_all(col("text"),
            lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long").as("re_tokens"),
          ceil(col("n_chars").cast("double") / 4.0).cast("long").as("est_bpe"),
          Text.rollingFingerprint("toks").as("doc_fp"))),

    // 16-bit SimHash fingerprints over distinct tokens; identical token
    // sets collapse to one fingerprint, near-dups differ in few bits.
    "x08_simhash" -> ((s, dir) =>
      // The range exchange of the input sort doubles as the spread():
      // one shuffle both distributes and orders.
      Sorted.byKey(t(s, dir, "documents"), col("doc_id"))
        .withColumn("dtoks", array_distinct(Text.tokens(col("text"))))
        .withColumn("ms", Text.md5Array("dtoks"))
        .select(col("doc_id"), Text.simhash16("ms").as("simhash"))),

    // IVF-style bucketed ANN: the coarse quantizer cell is the `label`
    // column (stand-in for a k-means assignment); search = equi-join on
    // the cell, top-k within it. The join shuffles on the cell id — at
    // scale each cell is a bounded candidate list, never a full scan.
    "x09_ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("label"),
          toD(col("embedding")).as("qv"))
      val c = e.select(col("vec_id").as("neighbor_id"),
        col("label").as("clabel"), toD(col("embedding")).as("cv"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos6").desc, col("neighbor_id"))
      q.join(c, col("label") === col("clabel") &&
          col("neighbor_id") =!= col("query_id"))
        .withColumn("cos6", round(Similarity.cosine(col("qv"), col("cv")), 6))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("query_id"), col("label"), col("rnk"), col("neighbor_id"),
          round(col("cos6"), 4).as("cosine"))
        .orderBy(col("query_id"), col("rnk"))
    }),

    // Embedding near-dup detection: corpus = embeddings ∪ perturbed
    // copies (×1.02 + tiny per-dim offset, id+10000). Candidates come
    // from an equi-join on the sign-LSH bucket; cosine ≥ 0.999
    // confirms. (Sign-LSH trades recall for never doing all-pairs; the
    // oracle computes the identical buckets, so results agree exactly.)
    // The code WIDTH is corpus-proportional (round-15, the sf10
    // receipt's one genuine quadratic: fixed 8-plane buckets gave
    // within-bucket mass ∝ n²/256 — 172× time for 10× data): one
    // cheap count() picks planesFor(n) at plan time, the x58 cells-∝-
    // corpus discipline applied to sign-LSH; ≤ sf1 it resolves to the
    // historical 8, so small-SF results are unchanged.
    "x10_embed_neardup" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val base = e.select(col("vec_id"), toD(col("embedding")).as("v"))
      val planes = Similarity.planesFor(2L * e.count())
      val pert = base.select(
        (col("vec_id") + 10000).as("vec_id"),
        transform(col("v"), (x, i) =>
          x * 1.02 + (pmod(i, lit(7)) - 3).cast("double") * 0.0001).as("v"))
      val corpus = spread(base.unionByName(pert))
        .withColumn("bucket", Similarity.signBucket(col("v"), planes, 64))
      // merge hint → identical shuffle subtrees → ReuseExchange computes
      // the bucket pipeline once (see Dedup.nearDupPairs)
      corpus.as("a").hint("merge")
        .join(corpus.as("b"),
          col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          round(Similarity.cosine(col("a.v"), col("b.v")), 6).as("cos6"))
        .filter(col("cos6") >= 0.999)
        .select(col("id_a"), col("id_b"), round(col("cos6"), 4).as("cosine"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Multimodal column plumbing: payload as opaque binary + typed
    // metadata; byte-level ops (octet length, hex head, content hash)
    // stay columnar. The decode stub itself is exercised in ScalaTest
    // (MultiModal.featurize — mapPartitions batch shape).
    "x11_multimodal_meta" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("content", col("text").cast("binary"))
        .select(col("doc_id"),
          expr("octet_length(content)").cast("long").as("byte_len"),
          lower(substring(hex(col("content")), 1, 16)).as("hex_head"),
          md5(col("content")).as("content_md5"),
          pmod(col("n_chars"), lit(640)).cast("long").as("width"),
          pmod(col("doc_id") * 7, lit(480)).cast("long").as("height"))
        .orderBy(col("doc_id"))),

    // Blocked n-gram Jaccard: pairwise trigram similarity *within a
    // blocking key* — (source, lang), so each block is |corpus|/100 and
    // pair count stays quadratic only in the block size. Blocking is THE
    // scalable shape for pairwise text similarity; the block key is a
    // shuffle key, each block's pairs are generated locally.
    "x12_ngram_jaccard_blocked" -> ((s, dir) => {
      // Per-block SAMPLE CAP (round-13, a SCALE-SF10 find): the
      // (source, lang) block count is FIXED (~100), so all-pairs
      // within blocks is n²/B — measured super-linear at 40× corpus
      // (21 s → 309 s for 4×). The audit's output is per-block
      // similarity STATISTICS, which a bounded deterministic sample
      // estimates; capping each block at its X12SampleCap lowest
      // doc_ids makes the pair mass ≤ B·(cap choose 2) — constant — at
      // any corpus size. The cap binds only past ~25k docs per corpus
      // (sf0.1: 50 docs/block; sf1: ~500/block → capped), so small-SF
      // outputs are the exact statistics and large-SF outputs the
      // estimator. The regime is an explicit output contract: every
      // row carries `sample_cap` so a consumer can tell estimator
      // output from exact output (n_pairs < cap·(cap−1)/2 ⇒ exact).
      val wBlk = Window.partitionBy(col("source"), col("lang"))
        .orderBy(col("doc_id"))
      val sh = spread(t(s, dir, "documents"))
        .withColumn("t", Text.tokens(col("text")))
        // docs under 3 tokens have no trigrams — drop them, or their
        // empty sets make jaccard 0/0 (NaN) and poison the block's avg
        .filter(size(col("t")) >= 3)
        // sorted-int64 shingle hashes through the block self-join +
        // two-pointer verify (round-16 — the nearDupPairs/x67
        // representation; same intersect counts, ~3× fewer shuffled
        // bytes per capped pair)
        .select(col("doc_id"), col("source"), col("lang"),
          Dedup.sortedHashedShingles(Text.wordShingles(col("t"))).as("s"))
        .withColumn("r", row_number().over(wBlk))
        .filter(col("r") <= X12SampleCap)
        .drop("r")
      sh.as("a").hint("merge") // exchange reuse: one shingle pass
        .join(sh.as("b"),
          col("a.source") === col("b.source") &&
            col("a.lang") === col("b.lang") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.source").as("source"), col("a.lang").as("lang"),
          Dedup.sortedJaccard(col("a.s"), col("b.s")).as("jac"))
        .groupBy(col("source"), col("lang"))
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(when(col("jac") >= 0.05, 1L).otherwise(0L)).as("n_similar"),
          round(max(col("jac")), 4).as("max_jac"),
          round(avg(col("jac")), 4).as("avg_jac"))
        .withColumn("sample_cap", lit(X12SampleCap.toLong))
        .orderBy(col("source"), col("lang"))
    }),
    // Normalization-insensitive dedup: corpus = documents ∪ copies
    // mutated only in case and spacing (id+10000); canonical-form
    // hashing must collapse each pair to the original row.
    "x14_normalized_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val mutated = docs.select(
        (col("doc_id") + 10000).as("doc_id"),
        concat(upper(col("text")), lit("  ")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      Dedup.normalizedDedup(
        docs.select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
          .unionByName(mutated),
        "text", "doc_id")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // Batch sessionization — the relational mirror of the streaming
    // flatMapGroupsWithState sessionizer (EventWindows.sessionize): a
    // session break is a >30-min gap; session id = running count of
    // breaks per user. Two window passes + one aggregate, all keyed on
    // user_id — state never leaves the user's partition.
    "x13_sessionize_batch" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_ms", lag(RelationalQueries.epochMs(col("ts")), 1).over(w))
        .withColumn("brk",
          when(col("prev_ms").isNull ||
            RelationalQueries.epochMs(col("ts")) - col("prev_ms") > 30 * 60 * 1000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("brk")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // x03 recomputed through the typed-Aggregator tier (§2i): a bounded
    // top-k heap aggregate instead of the window sort. The partial
    // aggregate reduces every partition to ≤ k rows per query BEFORE
    // the exchange — the window formulation shuffles and sorts every
    // candidate. The oracle is x03's window SQL verbatim, proving the
    // aggregator's (score desc, id asc) semantics equal row_number's.
    "x17_topk_agg" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), toD(col("embedding")).as("qv"))
      val c = e.select(col("vec_id").as("neighbor_id"), toD(col("embedding")).as("cv"))
      val top5 = graft.ext.TopK.topK(5)
      c.crossJoin(broadcast(q))
        .filter(col("neighbor_id") =!= col("query_id"))
        // integer micro-unit score, exact in a double — see x03
        .withColumn("cos_e6",
          floor(Similarity.cosine(col("qv"), col("cv")) * 1000000 + 0.5)
            .cast("double"))
        .groupBy(col("query_id"))
        .agg(top5(col("cos_e6"), col("neighbor_id")).as("top"))
        .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "sc")))
        .select(col("query_id"), (col("pos") + 1).cast("long").as("rnk"),
          col("sc.id").as("neighbor_id"),
          (floor(col("sc.score") / 100.0 + 0.5) / 10000.0).as("cosine"))
        .orderBy(col("query_id"), col("rnk"))
    }),

    // IVF ANN with a TRAINED coarse quantizer under the hash oracle:
    // KMeansLite.fitQuantized learns 8 cells in 2 Lloyd iterations
    // whose centroid update is bit-reproducible in SQL (integer
    // quantization instead of order-dependent avg(double) — see the
    // Scaladoc), the corpus is indexed by nearest cell, and each query
    // probes its 2 nearest cells for a top-3 cosine search. The
    // equi-join on the cell id is the scale shape: candidates per
    // query are a bounded bucket, never the corpus.
    "x16_ann_kmeans" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), toD(col("embedding")).as("v"))
      val cents = KMeansLite.fitQuantized(e, "vec_id", "v", k = 8, iters = 2)
      val assigned = e.select(col("vec_id").as("neighbor_id"),
        col("v").as("cv"), KMeansLite.assign(col("v"), cents).as("cell"))
      val wProbe = Window.partitionBy(col("query_id"))
        .orderBy(col("d2"), col("cell"))
      val probes = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          posexplode(KMeansLite.cellDistances(col("v"), cents))
            .as(Seq("cell", "d2")))
        .withColumn("cr", row_number().over(wProbe))
        .filter(col("cr") <= 2)
        .select(col("query_id"), col("qv"), col("cell"))
      val wRank = Window.partitionBy(col("query_id"))
        .orderBy(col("cos6").desc, col("neighbor_id"))
      probes.join(assigned, "cell")
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cos6", round(Similarity.cosine(col("qv"), col("cv")), 6))
        .withColumn("rnk", row_number().over(wRank).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("query_id"), col("rnk"), col("neighbor_id"),
          round(col("cos6"), 4).as("cosine"))
        .orderBy(col("query_id"), col("rnk"))
    }),

    // Repetition-based quality rules (the C4/Gopher-style filters):
    // duplicate-trigram ratio (1 − distinct/total 3-grams) and top
    // single-token frequency. Both are ratios of exact integers, so
    // the doubles divide identically cross-engine; the keep flag is a
    // pure predicate over them.
    "x22_repetition_filter" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("toks", Text.tokens(col("text")))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("n3", greatest(col("n_tokens") - 2, lit(0L)))
        .withColumn("d3", size(Text.wordShingles(col("toks"))).cast("long"))
      val topTf = docs
        .select(col("doc_id"), explode(col("toks")).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
        .groupBy(col("doc_id")).agg(max(col("tf")).as("max_tf"))
      docs.join(topTf, "doc_id")
        .withColumn("dup3_ratio",
          when(col("n3") === 0, lit(0.0)).otherwise(
            round(lit(1.0) - col("d3").cast("double") / col("n3").cast("double"), 4)))
        .withColumn("top_tok_ratio",
          round(col("max_tf").cast("double") / col("n_tokens").cast("double"), 4))
        .select(col("doc_id"), col("n_tokens"),
          col("dup3_ratio"), col("top_tok_ratio"),
          (col("dup3_ratio") <= 0.2 && col("top_tok_ratio") <= 0.2).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // Dedup CLUSTERS: near-dup pairs (the x02 MinHash/LSH pipeline) fed
    // into connected components (iterative min-label propagation,
    // ext/Components) — the step that turns pairwise edges into dedup
    // decisions. Corpus plants variant chains: every even doc gets an
    // 80%-prefix copy (id+10000), every 4th doc additionally a
    // 55%-prefix copy (id+20000); trigram containment makes
    // J(base, 80%) ≈ 0.8 and J(80%, 55%) ≈ 0.69 but J(base, 55%) ≈
    // 0.55 — near the LSH S-curve knee, so some clusters connect ONLY
    // transitively through the middle variant and the component step is
    // doing real work. Canonical survivor = component min id.
    "x23_dedup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      def mutant(frac: Double, shift: Int, every: Int) = docs
        .filter(pmod(col("doc_id"), lit(every)) === 0)
        .select((col("doc_id") + shift).as("doc_id"),
          array_join(slice(Text.tokens(col("text")), lit(1),
            greatest(floor(size(Text.tokens(col("text"))) * frac).cast("int"),
              lit(1))), " ").as("text"))
      val corpus = spread(docs.select(col("doc_id"), col("text"))
        .unionByName(mutant(0.8, 10000, 2))
        .unionByName(mutant(0.55, 20000, 4)))
      val sh = corpus.withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), Text.wordShingles(col("t")).as("s"))
      val edges = Dedup.nearDupPairs(sh, "doc_id", "s",
        numHashes = 12, bands = 4, threshold = 0.5)
      val comp = Components.connectedComponents(
        corpus.select(col("doc_id")), "doc_id", edges, "id_a", "id_b")
      val sizes = comp.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"))
      comp.join(sizes, "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
          (col("doc_id") === col("cluster_id")).as("is_canonical"))
        .orderBy(col("doc_id"))
    }),

    // Quality-aware dedup survivor selection — production pipelines
    // keep the BEST document of a near-dup cluster (longest, highest
    // quality), not the lowest id: the x23 cluster machinery (LSH
    // pairs → components) followed by a per-cluster ranking window on
    // token count (the truncated variants lose to their source by
    // construction). One extra window over the cluster id — the
    // ranking never leaves the cluster's partition.
    "x37_quality_survivor" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      def mutant(frac: Double, shift: Int, every: Int) = docs
        .filter(pmod(col("doc_id"), lit(every)) === 0)
        .select((col("doc_id") + shift).as("doc_id"),
          array_join(slice(Text.tokens(col("text")), lit(1),
            greatest(floor(size(Text.tokens(col("text"))) * frac).cast("int"),
              lit(1))), " ").as("text"))
      val corpus = spread(docs.select(col("doc_id"), col("text"))
        .unionByName(mutant(0.8, 10000, 2))
        .unionByName(mutant(0.55, 20000, 4)))
      val sh = corpus.withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), Text.wordShingles(col("t")).as("s"))
      val edges = Dedup.nearDupPairs(sh, "doc_id", "s",
        numHashes = 12, bands = 4, threshold = 0.5)
      val comp = Components.connectedComponents(
        corpus.select(col("doc_id")), "doc_id", edges, "id_a", "id_b")
      val withLen = comp.join(
        corpus.select(col("doc_id"),
          size(Text.tokens(col("text"))).cast("long").as("n_tokens")),
        "doc_id")
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("n_tokens").desc, col("doc_id"))
      withLen
        .withColumn("rk", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("cluster_id"), col("n_tokens"),
          (col("rk") === 1).as("survivor"))
        .orderBy(col("doc_id"))
    }),

    // Split-leakage audit — the integrity check a train/holdout split
    // needs AFTER dedup: a near-dup pair straddling the split boundary
    // leaks training signal into evaluation. Composes the x02 LSH
    // pipeline (planted near-dup pairs) with the x21 deterministic
    // hash split — variants hash independently of their source, so
    // cross-split pairs exist by construction and the audit counts
    // them per (split, split) cell. Remediation (not shown) is
    // group-aware splitting: hash the CLUSTER id, not the doc id.
    "x38_split_leakage" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = Text.tokens(col("text"))
      val mutated = docs.select(
        (col("doc_id") + 10000).as("doc_id"),
        array_join(slice(toks, lit(1), size(toks) - 3), " ").as("text"))
      val corpus = spread(docs.select(col("doc_id"), col("text")).unionByName(mutated))
      val sh = corpus
        .withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), Text.wordShingles(col("t")).as("s"))
      Dedup.nearDupPairs(sh, "doc_id", "s",
          numHashes = 12, bands = 4, threshold = 0.5)
        .withColumn("split_a", Sampling.holdoutSplit(col("id_a"), 230))
        .withColumn("split_b", Sampling.holdoutSplit(col("id_b"), 230))
        .groupBy(col("split_a"), col("split_b"))
        // per-pair jaccard is floor-scaled to integer e4 units BEFORE
        // the aggregate (the x32/x36 pattern): an integer sum is
        // order-independent, where round(avg(double), 4) could differ
        // cross-engine at a .00005 boundary from summation order
        .agg(count(lit(1)).as("n_pairs"),
          (sum(floor(col("jaccard") * 1e4 + 0.5)).cast("long") /
            (count(lit(1)) * lit(10000.0))).as("avg_jac"))
        .withColumn("leaky", col("split_a") =!= col("split_b"))
        .orderBy(col("split_a"), col("split_b"))
    }),

    // Train/eval contamination check (the n-gram decontamination step of
    // LLM training pipelines): the train side is every distinct 5-gram
    // in the corpus; the eval side plants known leaks (truncated copies
    // of even docs) and known-fresh docs (token order reversed) in equal
    // halves. The overlap join is an equi-join on the 5-gram string —
    // the vocabulary side is deduplicated first, so the shuffle carries
    // each distinct gram once, never |corpus| copies.
    "x24_contamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = spread(docs)
        .withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= 5)
        // the gram is ONLY a join key (never output): hash it to a
        // long so the distinct and the overlap join shuffle 8 bytes
        // per gram instead of the 5-token string (round-16 §2.3)
        .select(explode(Text.wordShingles(col("t"), 5)).as("g0"))
        .select(xxhash64(col("g0")).as("gram"))
        .distinct()
      val evalGrams = spread(docs)
        .withColumn("t", Text.tokens(col("text")))
        .withColumn("et",
          when(pmod(col("doc_id"), lit(2)) === 0,
            slice(col("t"), lit(1), greatest(size(col("t")) - 2, lit(1))))
            .otherwise(reverse(col("t"))))
        .filter(size(col("et")) >= 5)
        .select((col("doc_id") + 50000).as("eval_id"),
          when(pmod(col("doc_id"), lit(2)) === 0, lit("leaked"))
            .otherwise(lit("fresh")).as("origin"),
          explode(Text.wordShingles(col("et"), 5)).as("g0"))
        .select(col("eval_id"), col("origin"), xxhash64(col("g0")).as("gram"))
      evalGrams.join(vocab.withColumn("hit", lit(1L)), Seq("gram"), "left")
        .groupBy(col("eval_id"), col("origin"))
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .withColumn("contam_ratio",
          round(col("n_hit").cast("double") / col("n_grams").cast("double"), 4))
        .withColumn("contaminated", col("contam_ratio") >= 0.2)
        .orderBy(col("eval_id"))
    }),

    // Corpus-level n-gram inventory: top-10 trigrams per language by
    // document frequency (shingles are distinct per doc, so the count IS
    // df) — the blocklist-building step of contamination filtering.
    // Shuffles on (lang, gram) then lang; both keys bounded.
    "x25_corpus_ngrams" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("df").desc, col("gram"))
      spread(t(s, dir, "documents"))
        .withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= 3)
        .select(col("lang"), explode(Text.wordShingles(col("t"))).as("gram"))
        .groupBy(col("lang"), col("gram")).agg(count(lit(1)).as("df"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 10)
        .select(col("lang"), col("rnk"), col("gram"), col("df"))
        .orderBy(col("lang"), col("rnk"))
    }),

    // PII scrub (ext/Redact): detect + redact emails / IPv4s / NANP
    // phones. The corpus plants deterministic PII built from doc_id
    // arithmetic (docs have none naturally), so detection counts and
    // the md5 of every fully-redacted text are oracle-checkable. Narrow
    // codegen'd regexp map — zero shuffle; the only exchange is the
    // final presentation sort.
    "x26_pii_redaction" -> ((s, dir) => {
      val planted = spread(t(s, dir, "documents")).withColumn("pii_text",
        concat(col("text"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit(" Contact user"), col("doc_id").cast("string"),
              lit("@example.com"))).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(4)) === 0,
            concat(lit(" call 555-"),
              lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"),
              lit("-"),
              lpad(pmod(col("doc_id") * 7, lit(10000)).cast("string"), 4, "0")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5)) === 0,
            concat(lit(" from 10."), pmod(col("doc_id"), lit(256)).cast("string"),
              lit(".0."), pmod(col("doc_id") * 3, lit(256)).cast("string")))
            .otherwise(lit(""))))
      planted.select(
        col("doc_id"),
        Redact.countMatches(col("pii_text"), Redact.EmailPattern).as("n_emails"),
        Redact.countMatches(col("pii_text"), Redact.PhonePattern).as("n_phones"),
        Redact.countMatches(col("pii_text"), Redact.Ipv4Pattern).as("n_ips"),
        length(Redact.redact(col("pii_text"))).cast("long").as("redacted_len"),
        md5(Redact.redact(col("pii_text"))).as("redacted_md5"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic hash-split (train/holdout ≈ 90/10 via 230 of 256
    // md5 buckets) with per-stratum counts — membership is a pure
    // function of doc_id, so any re-run/re-shard/engine agrees.
    "x21_hash_split" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("split", Sampling.holdoutSplit(col("doc_id"), 230))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy(col("split"), col("lang"))),

    // TF-IDF top terms per document: explode → (doc, token) tf counts →
    // vocabulary df counts → smoothed idf — the full pipeline shuffles
    // only on (doc_id, token) and token; N is a broadcast 1-row
    // aggregate (scalar-subquery shape). idf is ROUNDED to 6 decimals
    // before scoring and ranking: ln() is the one non-correctly-rounded
    // primitive in the pipeline (libm vs DuckDB may differ by 1 ulp),
    // so both engines rank on the same quantized value.
    "x20_tfidf_topterms" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
      val tf = toks.groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val n = t(s, dir, "documents").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score4").desc, col("token"))
      tf.filter(col("doc_id") < 50)
        .join(df, "token")
        .crossJoin(broadcast(n))
        .withColumn("idf6",
          round(log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0, 6))
        .withColumn("score4", round(col("tf") * col("idf6"), 4))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("token"), col("tf"), col("score4"))
        .orderBy(col("doc_id"), col("rnk"))
    }),

    // Context packing (concat-and-chunk into 512-token contexts) per
    // (source, lang) shard — the serial cumsum never leaves a shard's
    // window partition; shards pack in parallel.
    "x19_context_pack" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("toks", size(Text.tokens(col("text"))))
        .select(col("doc_id"), col("source"), col("lang"), col("toks"))
        .transform(d => Pack.contextSpans(d, col("toks"), col("doc_id"),
          chunkTokens = 512, col("source"), col("lang")))
        .select(col("doc_id"), col("source"), col("lang"),
          col("n_tokens"), col("tok_offset"),
          col("first_chunk"), col("last_chunk"), col("n_chunks"))
        .orderBy(col("doc_id"))),

    // Symmetric int8 embedding quantization (storage compression) with
    // reconstruction metrics, per vector: the quantized L1 mass is
    // integer-exact in both engines, and the error/cosine metrics are
    // elementwise double ops with no accumulation-order freedom.
    "x18_int8_quant" -> ((s, dir) =>
      Sorted.byKey(t(s, dir, "embeddings"), col("vec_id"))
        .select(col("vec_id"), toD(col("embedding")).as("v"))
        .withColumn("scale", Quantize.int8Scale(col("v")))
        .withColumn("q", Quantize.quantize(col("v"), col("scale")))
        .withColumn("deq", Quantize.dequantize(col("q"), col("scale")))
        .select(
          col("vec_id"),
          round(col("scale"), 4).as("scale4"),
          aggregate(col("q"), lit(0L),
            (a, x) => a + abs(x).cast("long")).as("q_l1"),
          round(Quantize.maxError(col("v"), col("deq")), 6).as("max_err6"),
          round(Similarity.cosine(col("v"), col("deq")), 6).as("recon_cos6"))),

    // KMV distinct-count sketch (ext/Kmv): per-language distinct-
    // TRIGRAM cardinality (the size of the n-gram inventory x25
    // enumerates) estimated from a bounded 64-minima sketch, next to
    // the exact count. Unlike HLL (approx_count_distinct), md5-KMV is
    // deterministic, so the ORACLE validates the sketch itself — both
    // engines keep the same 64 minimum hashes and derive the same
    // estimate. The partial aggregate ships ≤ 64 hashes per
    // (partition, lang) — sketch-sized shuffle, corpus-sized never —
    // while the exact count must shuffle every distinct gram.
    "x27_kmv_distinct" -> ((s, dir) => {
      val k = 64
      val sk = graft.ext.Kmv.kmv(k)
      spread(t(s, dir, "documents"))
        .withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= 3)
        .select(col("lang"), explode(Text.wordShingles(col("t"))).as("gram"))
        .withColumn("h", graft.ext.Kmv.hash8(col("gram")))
        .groupBy(col("lang"))
        .agg(countDistinct(col("gram")).as("exact_distinct"),
          sk(col("h")).as("sk"))
        .select(col("lang"), col("exact_distinct"),
          graft.ext.Kmv.estimate(col("sk"), k).as("kmv_estimate"),
          try_element_at(col("sk"), lit(k)).as("kth_hash"))
        .orderBy(col("lang"))
    }),

    // Edit-distance near-dup: corpus = docs ∪ tail-mutated copies
    // (last 4 chars → " zq", id+10000). Blocking key = md5 of the
    // 32-char prefix (mutations never touch it), so candidate pairs
    // are linear in the corpus, and Levenshtein runs on bounded
    // 64-char tails only — never full texts, never all pairs. The
    // THRESHOLDED form (3-arg levenshtein, banded DP: O(k·n) cells,
    // early abandon past the k=10 band, returns −1 beyond it) replaces
    // the full O(n·m) table; within the band the distance is the
    // classic integer DP, exact cross-engine, so the oracle's
    // unthresholded distance ≤ 10 filter selects identical rows.
    "x28_edit_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("n_chars") >= 40)
      val mutated = docs.select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text").substr(lit(1), length(col("text")) - 4),
          lit(" zq")).as("text"))
      // localCheckpoint (round-11): the aliased self-join's two sides
      // are NOT identical subtrees (fresh exprIds per alias), so
      // exchange reuse never fired and the corpus pipeline — two
      // parquet scans, the md5 blocking key over every text — ran
      // TWICE (.explain showed 4 scans). Materializing the 3-column
      // blocked corpus once halves the heavy work; the join then
      // sorts 100k-row checkpoint reads, not recomputed lineage. The
      // projection to (doc_id, blk, tail) happens BEFORE any exchange
      // — the old spread shipped every full text for three derived
      // columns.
      val corpus = docs.select(col("doc_id"), col("text"))
        .unionByName(mutated)
        .withColumn("blk", md5(substring(col("text"), 1, 32)))
        .withColumn("tail",
          col("text").substr(greatest(length(col("text")) - 63, lit(1)),
            lit(64)))
        .select(col("doc_id"), col("blk"), col("tail"))
        .localCheckpoint()
      corpus.as("a").hint("merge")
        .join(corpus.as("b"),
          col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          levenshtein(col("a.tail"), col("b.tail"), 10).cast("long")
            .as("edit_dist"))
        .filter(col("edit_dist") >= 0) // −1 = abandoned beyond the band
        // materialize the (small) near-dup pair set before the output
        // sort: orderBy's range sampler otherwise re-executes the
        // whole join subtree a second time just to pick partition
        // bounds (measured +1.1 s of the old 3.5 s at sf1)
        .localCheckpoint()
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Incremental dedup — the production shape: a NEW batch deduped
    // against the existing corpus without ever re-deduping the corpus.
    // Batch = even docs copied verbatim (dups to drop), odd docs with
    // reversed token order (genuinely new). One left_anti equi-join on
    // the content hash (shuffles only the hashes, corpus never
    // rewritten) + one window for batch-internal dups.
    "x29_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpusHashes = docs.select(md5(col("text")).as("h")).distinct()
      val batch = docs.select(
        (col("doc_id") + 10000).as("doc_id"),
        when(pmod(col("doc_id"), lit(2)) === 0, col("text"))
          .otherwise(array_join(reverse(Text.tokens(col("text"))), " "))
          .as("text"),
        col("lang"))
      val w = Window.partitionBy(col("h")).orderBy(col("doc_id"))
      batch.withColumn("h", md5(col("text")))
        .join(corpusHashes, Seq("h"), "left_anti")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic per-source capping (the "no single domain dominates
    // the corpus" pretraining rule): keep ≤ 20 docs per (source, lang),
    // chosen by md5(doc_id) order — a stable pseudo-random sample, not
    // "first 20 by id" (which biases toward old docs) and not rand()
    // (which is irreproducible). One window keyed on the cap group.
    "x30_source_cap" -> ((s, dir) => {
      val w = Window.partitionBy(col("source"), col("lang"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      t(s, dir, "documents")
        .withColumn("pick", row_number().over(w).cast("long"))
        .filter(col("pick") <= 20)
        .select(col("source"), col("lang"), col("pick"), col("doc_id"))
        .orderBy(col("source"), col("lang"), col("pick"))
    }),

    // Sliding-window chunking with overlap (the RAG/pretrain chunker
    // x19's disjoint packing doesn't cover): window=128 tokens,
    // stride=96, last partial window kept iff it adds new tokens.
    // Pure narrow sequence+explode — chunk count per doc is
    // ceil((n-window)/stride)+1, no shuffle except the output sort.
    "x31_stride_chunks" -> ((s, dir) => {
      val win = 128
      val stride = 96
      val docs = Sorted.byKey(t(s, dir, "documents"), col("doc_id"))
        .withColumn("n_tokens", size(Text.tokens(col("text"))).cast("long"))
      docs.select(col("doc_id"), col("n_tokens"),
          explode(sequence(lit(0L),
            greatest(ceil((col("n_tokens") - win).cast("double") / stride)
              .cast("long"), lit(0L)))).as("chunk_idx"))
        .select(col("doc_id"), col("n_tokens"), col("chunk_idx"),
          (col("chunk_idx") * stride).as("tok_start"),
          least(col("chunk_idx") * stride + win, col("n_tokens")).as("tok_end"))
        .filter(col("tok_start") < col("n_tokens"))
    }),

    // Unigram language-model quality scoring (the CCNet/KenLM-style
    // "perplexity filter" of pretraining pipelines, with the corpus's
    // own unigram distribution standing in for the external LM): each
    // token scores ln p(token), a doc scores the mean; improbable
    // token salads rank low. Determinism: ln is quantized to 6
    // decimals (the one non-correctly-rounded primitive — x20's idf
    // precedent), then scaled to exact integer micro-units so the
    // per-doc SUM is order-independent; only the final mean divides.
    // Shape: one vocab aggregate + an equi-join on token + one per-doc
    // aggregate. The vocab side is NOT hint-broadcast: a corpus-scale
    // vocabulary (millions of tokens) must be allowed to hash-join on
    // the token key — Catalyst/AQE broadcasts it automatically only
    // while it fits the threshold. Only the 1-row total is pinned.
    "x32_unigram_logprob" -> ((s, dir) => {
      val toks = spread(t(s, dir, "documents"))
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
      val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
      val total = toks.agg(count(lit(1)).as("total"))
      val scored = toks
        .join(vocab, "token")
        .crossJoin(broadcast(total))
        .withColumn("lp6_e6",
          round(round(log(col("c").cast("double") / col("total").cast("double")), 6)
            * 1e6).cast("long"))
      scored.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("lp6_e6")).as("sum_e6"))
        .select(col("doc_id"), col("n_tokens"),
          round(col("sum_e6").cast("double")
            / (col("n_tokens") * 1000000L).cast("double"), 4).as("avg_logp"))
        .orderBy(col("doc_id"))
    }),

    // Fixed-width length histogram per language — corpus EDA / length
    // filtering support: 100-char buckets capped at bucket 9. Single
    // hash aggregate on the (lang, bucket) pair.
    "x33_length_histogram" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("bucket",
          least(floor(col("n_chars") / 100), lit(9L)).cast("long"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy(col("lang"), col("bucket"))),

    // SEMANTIC decontamination — x24's n-gram check caught verbatim
    // leaks; this catches paraphrase-level leaks by embedding
    // similarity. Eval set plants leaks (perturbed copies of even
    // corpus vectors — near-identical direction) and fresh items
    // (dimension-reversed vectors — independent direction for random
    // embeddings). Candidates come ONLY from the sign-LSH bucket
    // equi-join (x10's machinery): the shuffle pairs each eval
    // vector with its bucket's corpus vectors, never eval × corpus.
    // The code WIDTH is corpus-proportional (round-16, closing the
    // sf10 receipt's quadratic: eval×corpus within-bucket mass is
    // n²/2^P at a fixed width) — planesFor over the 2n bucketized
    // rows, the exact x10 treatment; ≤ sf1 the ladder resolves to
    // the historical 8, so small-SF results are unchanged.
    // Output is integer hit counts against the 0.99 threshold, not a
    // float max: planted cosines sit at ≈0.9998 (leaks) vs ≤0.5
    // (bucket noise), so the predicate is immune to the ~1e-6
    // cross-engine summation wobble that a re-rounded max-of-many
    // would surface at boundary values.
    "x34_semantic_contamination" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val base = e.select(col("vec_id"), toD(col("embedding")).as("v"))
      val planes34 = Similarity.planesFor(2L * e.count())
      val evalSet = base.select(
        (col("vec_id") + 50000).as("eval_id"),
        when(pmod(col("vec_id"), lit(2)) === 0, lit("leaked"))
          .otherwise(lit("fresh")).as("origin"),
        when(pmod(col("vec_id"), lit(2)) === 0,
          transform(col("v"), (x, i) =>
            x * 1.02 + (pmod(i, lit(7)) - 3).cast("double") * 0.0001))
          .otherwise(reverse(col("v"))).as("ev"))
        .withColumn("bucket", Similarity.signBucket(col("ev"), planes34, 64))
      val corpus = spread(base)
        .withColumn("bucket", Similarity.signBucket(col("v"), planes34, 64))
      evalSet.join(corpus, Seq("bucket"), "left")
        .withColumn("hit",
          when(col("v").isNotNull &&
            Similarity.cosine(col("ev"), col("v")) >= 0.99, 1L)
            .otherwise(0L))
        .groupBy(col("eval_id"), col("origin"))
        .agg(count(col("vec_id")).as("n_candidates"),
          sum(col("hit")).as("n_hits"))
        .withColumn("contaminated", col("n_hits") > 0)
        .orderBy(col("eval_id"))
    }),

    // Embedding prep: L2 normalization (after which cosine = dot — the
    // precondition every ANN index assumes) and Matryoshka-style
    // prefix truncation (how much of the norm mass the first 16 of 64
    // dims carry — the cheap-prefix-search viability metric). Narrow
    // per-vector map, no shuffle beyond the input range sort.
    "x35_embed_normalize" -> ((s, dir) => {
      val norm2 = (v: Column) =>
        sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x))
      Sorted.byKey(t(s, dir, "embeddings"), col("vec_id"))
        .select(col("vec_id"), toD(col("embedding")).as("v"))
        .withColumn("nrm", norm2(col("v")))
        .withColumn("unit", transform(col("v"), x => x / col("nrm")))
        .select(
          col("vec_id"),
          round(col("nrm"), 4).as("norm4"),
          // self-cosine of the normalized vector must be 1 (sanity of
          // the normalize step; rounding absorbs the re-fold)
          round(norm2(col("unit")), 4).as("unit_norm4"),
          round(norm2(slice(col("v"), 1, 16)) / col("nrm"), 4)
            .as("prefix16_mass4"))
    }),

    // MinHash fidelity check — closes the LSH methodology loop: for
    // every confirmed near-dup pair, compare the SKETCH estimate of
    // Jaccard (fraction of agreeing signature components — the quantity
    // LSH banding actually thresholds on) against the exact set
    // Jaccard. Deterministic because the signatures are md5-derived,
    // so both engines compute identical sketches; err_pp (percentage
    // points, integer-scaled) is exact integer arithmetic.
    "x36_minhash_fidelity" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = Text.tokens(col("text"))
      val mutated = docs.select(
        (col("doc_id") + 10000).as("doc_id"),
        array_join(slice(toks, lit(1), size(toks) - 3), " ").as("text"))
      val corpus = spread(docs.select(col("doc_id"), col("text")).unionByName(mutated))
      val sh = corpus
        .withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), Text.wordShingles(col("t")).as("s"))
        .withColumn("sig", Dedup.minhashSignature(col("s"), 12))
      val pairs = sh.as("a").hint("merge")
        .join(sh.as("b"), col("a.doc_id") + 10000 === col("b.doc_id"))
      pairs.select(
          col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          size(filter(zip_with(col("a.sig"), col("b.sig"), (x, y) => x === y),
            eq => eq)).cast("long").as("agree"),
          round(Dedup.jaccard(col("a.s"), col("b.s")), 4).as("exact_jac"))
        .withColumn("est_jac", round(col("agree").cast("double") / 12.0, 4))
        // floor(x·10⁴+0.5), not a double→long cast: Spark's cast
        // truncates while DuckDB's rounds, so casts of rounded doubles
        // diverge at representation boundaries; floor is floor in both
        .withColumn("err_pp",
          abs(floor(col("est_jac") * 10000 + 0.5)
            - floor(col("exact_jac") * 10000 + 0.5)).cast("long"))
        .orderBy(col("doc_a"))
    }),

    // SQL-API surface: the same native cosine expression, but reached
    // through the FunctionRegistry (GraftExtensions /
    // GraftFunctions.ensureRegistered) and a spark.sql text query —
    // resolution, codegen and the oracle all treat it like a built-in.
    // The 1-row query side is a broadcast nested-loop join (the scalar
    // -subquery shape). floor(x·10⁴+0.5), not round(round(x,6),4): the
    // raw doubles are bit-identical across engines (sequential fold),
    // but round() is BigDecimal-via-string HALF_UP in Spark vs raw
    // double arithmetic in DuckDB, and the first round manufactures
    // exact …50 ties at the 4th decimal that the engines then break
    // differently (9/20000 rows at sf1). floor of identical doubles
    // is identical everywhere.
    "x15_sql_cosine" -> ((s, dir) => {
      org.apache.spark.sql.GraftFunctions.ensureRegistered(s)
      t(s, dir, "embeddings").createOrReplaceTempView("emb_sql")
      s.sql("""
        WITH q AS (SELECT CAST(embedding AS ARRAY<DOUBLE>) AS qv
                   FROM emb_sql WHERE vec_id = 0)
        SELECT e.vec_id,
               CAST(FLOOR(cosine_similarity(CAST(e.embedding AS ARRAY<DOUBLE>),
                                            q.qv) * 10000 + 0.5) AS DOUBLE)
                 / 10000 AS cos_q0
        FROM emb_sql e CROSS JOIN q
        ORDER BY e.vec_id
      """)
    }),

    // Group-aware (leakage-free) train/holdout split — the remediation
    // x38's audit calls for: hash the near-dup CLUSTER id, not the doc
    // id, so every variant of a document lands in the same split and no
    // near-dup pair can straddle the boundary (GroupSplitSpec asserts
    // zero crossing pairs on this exact pipeline). Same corpus and LSH
    // pipeline as x38, x23's components to get cluster ids, x21's
    // md5-bucket membership applied to the cluster id. The split stays
    // a pure function of the data — rerunning with more executors or a
    // grown corpus keeps every old doc's assignment.
    "x39_group_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = Text.tokens(col("text"))
      val mutated = docs.select(
        (col("doc_id") + 10000).as("doc_id"),
        array_join(slice(toks, lit(1), size(toks) - 3), " ").as("text"))
      val corpus = spread(docs.select(col("doc_id"), col("text"))
        .unionByName(mutated))
      val sh = corpus
        .withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), Text.wordShingles(col("t")).as("s"))
      val edges = Dedup.nearDupPairs(sh, "doc_id", "s",
        numHashes = 12, bands = 4, threshold = 0.5)
      Components.connectedComponents(
          corpus.select(col("doc_id")), "doc_id", edges, "id_a", "id_b")
        .withColumn("split", Sampling.holdoutSplit(col("cluster_id"), 230))
        .select(col("doc_id"), col("cluster_id"), col("split"))
        .orderBy(col("doc_id"))
    }),

    // Heavy hitters under a count-min sketch (ext/Cms): the counter
    // grid is a 4×256 hash aggregate — map-side combined, constant
    // size at ANY corpus scale — and the top-20 trigrams probe it with
    // a broadcast join. cms_est >= exact_df always (collisions only
    // add); the overest column is the sketch's documented error, and
    // the oracle recomputes the identical md5-bucketed grid. Trigrams
    // rather than tokens: the corpus vocabulary is too small to
    // exercise collisions (TESTDATA note). The exact top-20 ranking
    // here is the presentation baseline; unbounded-cardinality
    // deployments swap in the x17 bounded top-k Aggregator.
    "x40_heavy_hitters" -> ((s, dir) => {
      val occ = spread(t(s, dir, "documents"))
        .withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), explode(Text.wordShingles(col("t"))).as("gram"))
      val exact = occ.groupBy(col("gram")).agg(count(lit(1)).as("exact_df"))
      val grid = Cms.counterGrid(occ, "gram", depth = 4, width = 256)
      val w = Window.orderBy(col("exact_df").desc, col("gram"))
      val top = exact.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 20)
      Cms.estimate(top, "gram", grid, depth = 4, width = 256)
        .select(col("rnk"), col("gram"), col("exact_df"), col("cms_est"),
          (col("cms_est") - col("exact_df")).as("overest"))
        .orderBy(col("rnk"))
    }),

    // x41_zorder_layout (Z-order PRUNING-METRIC harness) was RETIRED
    // to spec-only in round 15 on the x85/x96 precedent (r14 verdict
    // task #6): it priced the 64-bucket global-ntile measurement
    // harness (adjudicated 5× DuckDB at sf1 — two global windows over
    // the fact table that exist only to METER pruning), while x93 is
    // the registered DEPLOYMENT form of the operator
    // (repartitionByRange(z) + sortWithinPartitions, faster than
    // DuckDB at sf1). Coverage unchanged: ZOrderSpec pins the
    // bijection, bit placement, and pruning-vs-linear-sort win;
    // ext/ZOrder.bucketStats remains the spec-tested metric API.

    // Incremental LSH index maintenance (ext/Dedup.bandIndex +
    // incrementalPairs): the new batch (truncated variants) probes the
    // EXISTING corpus's persisted band index instead of recomputing it
    // — the daily-ingest form of x02. The oracle is x02's full-corpus
    // recompute VERBATIM: on an internally-dedup'd index the
    // incremental path must find exactly the pairs the full pipeline
    // finds, which is the strongest statement of its correctness.
    "x42_incremental_lsh" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = Text.tokens(col("text"))
      val mutated = docs.select(
        (col("doc_id") + 10000).as("doc_id"),
        array_join(slice(toks, lit(1), size(toks) - 3), " ").as("text"))
      def shingled(d: DataFrame) = spread(d)
        .withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), Text.wordShingles(col("t")).as("s"))
      val index = Dedup.bandIndex(
        shingled(docs.select(col("doc_id"), col("text"))), "doc_id", "s")
      Dedup.incrementalPairs(index, shingled(mutated), "doc_id", "s")
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Corpus mixture sampling — hit target per-language proportions
    // (the data-mixing step before LLM training: 40% en, 20% de/fr,
    // 10% es/zh of a 300-doc budget) with a DETERMINISTIC pick: docs
    // rank within their language by md5 of the id, so the sample is
    // reproducible across runs/engines and unbiased w.r.t. any data
    // ordering (x30's capping argument). One window shuffle on lang;
    // membership is a pure function of (lang, doc_id).
    "x43_mixture_sample" -> ((s, dir) => {
      val weights = Seq(
        "en" -> 0.40, "de" -> 0.20, "fr" -> 0.20, "es" -> 0.10, "zh" -> 0.10)
      val budget = 300L
      val quota = weights.foldLeft(lit(0L)) { case (acc, (l, w)) =>
        when(col("lang") === l, lit(math.floor(budget * w).toLong)).otherwise(acc)
      }
      val wnd = Window.partitionBy(col("lang"))
        .orderBy(md5(concat(lit("mix:"), col("doc_id").cast("string"))), col("doc_id"))
      t(s, dir, "documents")
        .withColumn("rn", row_number().over(wnd).cast("long"))
        .withColumn("quota", quota)
        .withColumn("selected", col("rn") <= col("quota"))
        .select(col("doc_id"), col("lang"), col("source"),
          col("rn"), col("quota"), col("selected"))
        .orderBy(col("doc_id"))
    }),

    // Interpolation-free Laplace BIGRAM LM scoring — x32's unigram
    // quality filter upgraded one order: p(w2|w1) = (c12+1)/(c1+V),
    // per-doc mean log-prob in integer micro-units (same quantization
    // as x32, so the aggregate is order-independent cross-engine).
    // Shuffles: one on the bigram string, one on the context word, one
    // on doc_id; V is a broadcast scalar.
    "x44_bigram_lm" -> ((s, dir) => {
      val toksDf = spread(t(s, dir, "documents"))
        .withColumn("t", Text.tokens(col("text")))
      val vsize = toksDf.select(explode(col("t")).as("token"))
        .agg(countDistinct(col("token")).as("v"))
      // Round-16: the bigram/unigram keys are grouping-only (never
      // output) — hash them to longs. Round-17: both counts ride
      // SaltedAgg's two-level aggregate + AQE-managed join-back
      // instead of window aggregates — the Heaps-bounded bigram and
      // unigram count tables broadcast back at bench scale (zero
      // corpus exchange) and AQE skew-splits the attach beyond it; a
      // hot unigram ("the") no longer lands every occurrence in one
      // window task's sort+buffer (guide §2.2/§2.5/§3.1; r16 ADVICE).
      val bg = toksDf.filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(t)-1)," +
            " i -> concat(element_at(t,i), ' ', element_at(t,i+1)))")).as("b0"))
        .select(col("doc_id"), xxhash64(col("b0")).as("b"),
          xxhash64(element_at(split(col("b0"), " "), 1)).as("w1"))
      val withCb = graft.ext.SaltedAgg.attach(bg, "b",
        Seq(col("doc_id")),
        Seq(count(lit(1)).as("p_cb")), Seq(sum(col("p_cb")) -> "cb"))
      graft.ext.SaltedAgg.attach(withCb, "w1",
          Seq(col("doc_id"), col("b")),
          Seq(count(lit(1)).as("p_cw")), Seq(sum(col("p_cw")) -> "cw"))
        .crossJoin(broadcast(vsize))
        .withColumn("lp_e6",
          round(round(log((col("cb").cast("double") + lit(1.0)) /
            (col("cw").cast("double") + col("v").cast("double"))), 6) * 1e6)
            .cast("long"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_e6")).as("sum_e6"))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("sum_e6").cast("double")
            / (col("n_bigrams") * 1000000L).cast("double"), 4).as("avg_logp"))
        .orderBy(col("doc_id"))
    }),

    // Snapshot diff — added/removed/changed/unchanged between two
    // dataset versions (v2 derived deterministically: every 10th doc
    // dropped, ids ≡1 edited, ids ≡2 re-added as new docs). The diff
    // is ONE full-outer hash join on the key comparing content hashes,
    // never texts — at 100 TB the md5 rides the shuffle at 32 bytes/row
    // and the join output is the audit table a lakehouse version-diff
    // (table-format snapshot compare) would produce.
    "x45_snapshot_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val v2 = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(10)) === 1,
            concat(col("text"), lit(" rev2"))).otherwise(col("text")).as("text"),
          col("source"))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(10)) === 2)
          .select((col("doc_id") + 20000).as("doc_id"),
            concat(lit("fresh "), col("text")).as("text"), col("source")))
      docs.select(col("doc_id"), col("text"), col("source")).as("a")
        .join(v2.as("b"), col("a.doc_id") === col("b.doc_id"), "full_outer")
        .select(
          coalesce(col("a.doc_id"), col("b.doc_id")).as("doc_id"),
          coalesce(col("a.source"), col("b.source")).as("source"),
          when(col("b.doc_id").isNull, lit("removed"))
            .when(col("a.doc_id").isNull, lit("added"))
            .when(md5(col("a.text")) =!= md5(col("b.text")), lit("changed"))
            .otherwise(lit("unchanged")).as("status"))
        .orderBy(col("doc_id"))
    }),

    // Data-quality expectations audit — the constraint screen a
    // pipeline runs before promoting a batch: null/range/set/pattern/
    // uniqueness checks computed in ONE pass (a single hash-free
    // aggregate with map-side partials; every check is a conditional
    // sum), then unpivoted to a check-per-row report. Checks that pass
    // report 0 — the audit's value is the machinery, not planted dirt.
    "x46_dq_expectations" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      def viol(c: Column) = sum(when(c, 1L).otherwise(0L))
      ev.agg(
          count(lit(1)).as("n_rows"),
          viol(col("value").isNull).as("null_value"),
          viol(col("value") < 0).as("negative_value"),
          viol(!col("event_type").isin(
            "click", "view", "purchase", "signup", "error"))
            .as("unknown_event_type"),
          viol(col("ts").isNull).as("null_ts"),
          viol(col("ts") < lit("2024-01-01").cast("timestamp") ||
            col("ts") >= lit("2026-01-01").cast("timestamp"))
            .as("ts_out_of_range"),
          (count(lit(1)) - countDistinct(col("event_id")))
            .as("duplicate_event_id"),
          viol(col("props").isNull || !col("props").like("{%"))
            .as("malformed_props"))
        .select(col("n_rows"), expr(
          "stack(7," +
            " 'duplicate_event_id', duplicate_event_id," +
            " 'malformed_props', malformed_props," +
            " 'negative_value', negative_value," +
            " 'null_ts', null_ts," +
            " 'null_value', null_value," +
            " 'ts_out_of_range', ts_out_of_range," +
            " 'unknown_event_type', unknown_event_type)" +
            " as (check_name, n_violations)"))
        .withColumn("violation_ppm",
          floor((col("n_violations") * 1000000L).cast("double")
            / col("n_rows").cast("double")).cast("long"))
        .select(col("check_name"), col("n_rows"), col("n_violations"),
          col("violation_ppm"))
        .orderBy(col("check_name"))
    }),

    // Trailing 7-day distinct actives per day — the rolling engagement
    // metric. The stream first shrinks to distinct (user, day) pairs
    // (≤ users × days, orders of magnitude under the event count), the
    // day spine is a BOUNDED broadcast side (days, not rows), and the
    // count-distinct shuffles on the day. Windowed count distinct
    // can't be expressed as a frame (DISTINCT is not frame-able), so
    // the spine join IS the scalable formulation.
    "x47_rolling_active" -> ((s, dir) => {
      val pairs = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val days = pairs.select(col("d").as("day")).distinct()
      pairs.join(broadcast(days),
          col("d") >= date_sub(col("day"), 6) && col("d") <= col("day"))
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("active_users_7d"),
          countDistinct(col("d")).as("days_covered"))
        .orderBy(col("day"))
    }),

    // IQR outlier screen per group — exact q23-style rank percentiles
    // give p25/p75, Tukey fences (±1.5·IQR) flag anomalies. The corpus
    // plants deterministic anomalies (every 199th event's value ×25 —
    // the x26 planted-PII pattern: the data has none naturally), so
    // flagged counts are integer-exact cross-engine; the fences are
    // identical doubles because both engines run the identical IEEE
    // expression on identical inputs. Shuffle shapes: one window on
    // the group, one broadcast join of a 5-row bounds table.
    "x48_outlier_fences" -> ((s, dir) => {
      val base = t(s, dir, "events").select(
        col("event_type"), col("event_id"),
        when(pmod(col("event_id"), lit(199)) === 0, col("value") * 25.0)
          .otherwise(col("value")).as("v"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("v"), col("event_id"))
      val wc = Window.partitionBy(col("event_type"))
      def atP(p: Double) =
        max(when(col("rn") === floor((col("n") - 1) * p) + 1, col("v")))
      val bounds = base
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(wc))
        .groupBy(col("event_type"))
        .agg(atP(0.25).as("p25"), atP(0.75).as("p75"))
        .withColumn("hi", col("p75") + (col("p75") - col("p25")) * 1.5)
        .withColumn("lo", col("p25") - (col("p75") - col("p25")) * 1.5)
        .select(col("event_type"), col("hi"), col("lo"))
      base.join(broadcast(bounds), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("n_above"),
          sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("n_below"),
          round(max(col("hi")), 2).as("hi_fence"),
          round(max(col("lo")), 2).as("lo_fence"))
        .orderBy(col("event_type"))
    }),

    // Chunk-granularity duplication audit — x01 dedups whole documents;
    // training corpora also carry PARTIAL overlap (boilerplate,
    // quoted passages), measured here at 20-token chunk grain (the
    // CCNet/C4 paragraph-dedup analogue on a corpus with no paragraph
    // marks). Corpus plants partial dups (x02's truncated copies), so
    // originals and copies share all-but-the-last chunk. Shuffle keys:
    // chunk md5 (occurrence count), then doc_id — chunks ride the
    // shuffle as 32-byte hashes, never text.
    "x49_chunk_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = Text.tokens(col("text"))
      val mutated = docs.select(
        (col("doc_id") + 10000).as("doc_id"),
        array_join(slice(toks, lit(1), size(toks) - 3), " ").as("text"))
      val corpus = spread(
        docs.select(col("doc_id"), col("text")).unionByName(mutated))
      val chunks = corpus
        .withColumn("t", Text.tokens(col("text")))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, cast(floor((size(t)-1)/20) as int))," +
            " i -> md5(array_join(slice(t, i*20+1, 20), ' ')))")).as("h"))
      val occ = chunks.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("docs_with"))
      chunks.join(occ, "h")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("docs_with") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
        .withColumn("dup_ppm",
          floor((col("n_dup_chunks") * 1000000L).cast("double")
            / col("n_chunks").cast("double")).cast("long"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic binned-histogram quantiles — the SKETCH swap-in
    // that q23's exact-rank percentiles point at for unbounded group
    // cardinalities: fixed 0.5-wide bins (1000 over the value range)
    // aggregate to a counts grid whose size is bins × groups no matter
    // the row count, partial-aggregable map-side like any hash
    // aggregate; the quantile is then the upper edge of the first bin
    // whose cumulative count reaches ceil(p·n). All arithmetic is
    // integer (counts) or exact multiples of 0.5 — no float wobble.
    "x50_binned_quantiles" -> ((s, dir) => {
      val hist = t(s, dir, "events")
        .select(col("event_type"),
          least(floor(col("value") / 0.5), lit(999L)).cast("long").as("bin"))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("c"))
      val wcum = Window.partitionBy(col("event_type")).orderBy(col("bin"))
      val wall = Window.partitionBy(col("event_type"))
      def pick(p: Double) =
        (min(when(col("cum") >= ceil(col("n") * p), col("bin"))) + 1) * 0.5
      hist
        .withColumn("cum", sum(col("c")).over(wcum))
        .withColumn("n", sum(col("c")).over(wall))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n_events"),
          pick(0.5).as("p50_ub"), pick(0.9).as("p90_ub"),
          pick(0.99).as("p99_ub"))
        .orderBy(col("event_type"))
    }),

    // Temperature-scaled mixture weights — x43 takes FIXED proportions;
    // the standard LLM-data recipe derives them from corpus counts,
    // w_s ∝ n_s^α (α = 0.7): big sources are damped, small sources
    // up-weighted, without hand-tuning. The α-power is quantized to
    // integer micro-units (the x32/x20 pattern — pow is not correctly
    // rounded cross-libm), so the weight total is an exact long and
    // every quota is one exact integer division — budget×w_e6 div
    // total. One tiny aggregate (sources, not docs) + a broadcast
    // scalar; the doc-level pick then reuses x43's md5-ranked window.
    "x51_temperature_mix" -> ((s, dir) => {
      val scored = t(s, dir, "documents")
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .withColumn("w_e6",
          round(round(pow(col("n_docs").cast("double"), 0.7), 6) * 1e6)
            .cast("long"))
      scored.crossJoin(broadcast(scored.agg(sum(col("w_e6")).as("total_e6"))))
        .select(col("source"), col("n_docs"), col("w_e6"),
          expr("(3000 * w_e6) div total_e6").as("quota"))
        .orderBy(col("source"))
    }),

    // Segment-level dedup WITH document reconstruction — the removal
    // operator x49's duplication audit points at (CCNet drops
    // duplicated paragraphs and keeps the rest of the page; C4 does
    // the same at line grain). Segments = sequential 15-token spans
    // (this corpus has no paragraph marks; same grain convention as
    // x49's 20-token chunks). A segment whose hash appears in MORE
    // THAN ONE document is dropped everywhere; survivors reassemble in
    // original order and the rebuilt text ships as its md5 (hashes,
    // never texts, ride the compare — and in the real pipeline the
    // rebuilt text would be written back, not hashed).
    //
    // Scale shape: segments ride every shuffle as (doc_id, idx, 32-
    // byte hash + text-of-15-tokens); occurrence counting is one hash
    // aggregate on the segment hash; reassembly is a per-doc
    // collect_list bounded by the doc's own segment count (the same
    // per-group bound as any string_agg) — nothing is quadratic and
    // nothing leaves its hash partition.
    "x52_segment_dedup_rebuild" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = Text.tokens(col("text"))
      val mutated = docs.select(
        (col("doc_id") + 10000).as("doc_id"),
        // greatest(…, 0): Spark's slice THROWS on a negative length
        // (and DuckDB's t[1:negative] silently means index-from-end),
        // so a future sub-3-token doc must clamp to empty, not fail
        array_join(slice(toks, lit(1), greatest(size(toks) - 3, lit(0))), " ")
          .as("text"))
      val corpus = spread(
        docs.select(col("doc_id"), col("text")).unionByName(mutated))
      val segs = corpus
        .withColumn("t", Text.tokens(col("text")))
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, cast(floor((size(t)-1)/15) as int))," +
            " i -> array_join(slice(t, i*15+1, 15), ' '))")))
        .select(col("doc_id"), col("pos").as("idx"), col("col").as("seg"))
        .withColumn("h", md5(col("seg")))
      val occ = segs.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("docs_with"))
      segs.join(occ, "h")
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_segs"),
          sum(when(col("docs_with") === 1, 1L).otherwise(0L)).as("n_kept"),
          // kept segments only (collect_list skips the nulls the when
          // produces), re-ordered by idx — struct sort keys on the
          // leading field, and idx is unique within the doc
          md5(array_join(
            transform(
              array_sort(collect_list(
                when(col("docs_with") === 1, struct(col("idx"), col("seg"))))),
              x => x.getField("seg")),
            " ")).as("clean_md5"))
        .orderBy(col("doc_id"))
    }),

    // Vocabulary coverage / OOV rate — the tokenizer-coverage analysis
    // a fixed-vocabulary training run needs: build the corpus top-K
    // vocabulary (by frequency, lexicographic tie-break) and measure
    // what fraction of each document falls outside it. K = 25 because
    // this synthetic corpus's whole vocabulary is deliberately tiny
    // (TESTDATA note) — at a real corpus K is the tokenizer's vocab
    // size and the shape is unchanged.
    //
    // Scale shape: token counting is one partial-aggregated shuffle on
    // the token; top-K selection is orderBy+limit, which Spark plans as
    // TakeOrderedAndProject — every partition keeps its LOCAL top K and
    // only K·partitions rows ever meet, so no vocabulary-sized
    // single-partition sort exists even at billions of distinct tokens
    // (the round-7 rank-window form put the whole vocabulary through
    // one WindowExec partition); the per-doc membership probe is a
    // broadcast hash join, so the fact side never reshuffles. Integer
    // ppm keeps the compare exact.
    "x53_vocab_coverage" -> ((s, dir) => {
      val toks = spread(t(s, dir, "documents"))
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
      val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("token"))
        .limit(25)
        .select(col("token"), lit(1L).as("in_vocab"))
      toks.join(broadcast(vocab), Seq("token"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_ppm", expr("(n_oov * 1000000) div n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // Per-source distribution drift — KL(source ‖ corpus) over unigram
    // distributions: the mix monitor that catches one source skewing
    // the blend (a scraper gone wrong, a filter eating one domain)
    // BEFORE training sees it. Source support ⊆ corpus support by
    // construction, so no smoothing is needed; each token's ln p is
    // quantized to integer micro-units exactly as x32 does (ln is not
    // correctly-rounded cross-libm; round-to-6-decimals first makes
    // both engines agree), the per-token terms c_s·(lnp_s − lnp_c) are
    // then INTEGERS — summation order cannot perturb them — and the
    // final per-token normalization is one integer division. The
    // greatest(…, 0) guard pins the ±quantization wobble of a
    // near-zero KL to exactly 0 in both engines (trunc-vs-floor
    // division semantics diverge on negatives).
    //
    // Scale shape: two hash aggregates (corpus vocab, per-source
    // counts) + a vocab equi-join; the corpus total is a broadcast
    // scalar. Output is one row per source at ANY corpus size.
    "x54_source_drift" -> ((s, dir) => {
      val toks = spread(t(s, dir, "documents"))
        .select(col("source"), explode(Text.tokens(col("text"))).as("token"))
      val reference = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
      val bySrc = toks.groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("c_s"))
      // KL arithmetic lives in ext/Drift, SHARED with the streaming
      // windowed monitor (StreamDrift) so the two paths cannot drift
      // from each other — same sharing discipline as the daily rollup.
      graft.ext.Drift.klMicro(bySrc, Seq("source"), reference)
        .orderBy(col("source"))
    }),

    // Exact repeated-substring spans — the stride-1 window form of the
    // suffix-array exact-substring dedup (find ANY ≥w-token run that
    // repeats across documents, not just runs aligned to a fixed
    // chunk grid like x49/x52): a window at EVERY token offset means
    // a repeated run of length L ≥ w is marked at L−w+1 consecutive
    // offsets, and the per-doc longest boilerplate span falls out of
    // a gaps-and-islands pass (q30's pattern) over the marked offsets:
    // max consecutive marked streak + w − 1.
    //
    // Scale shape: windows ride the shuffle as 8-byte hashes (n·w
    // bytes of hashing per doc, n rows out — the explode is linear,
    // never quadratic); the cross-doc repeat test is a two-level
    // salted min/max on the window hash (one corpus shuffle,
    // hot-key-safe — SaltedAgg); the islands pass is one window
    // function keyed on doc_id. At extreme scale a
    // suffix-array-per-partition cuts the n·w hashing constant; the
    // relational shape stays the same.
    "x55_repeated_spans" -> ((s, dir) => {
      val w = 10
      val docs = t(s, dir, "documents")
      val toks = Text.tokens(col("text"))
      val mutated = docs.select(
        (col("doc_id") + 10000).as("doc_id"),
        array_join(slice(toks, lit(1), greatest(size(toks) - 3, lit(0))), " ")
          .as("text"))
      val corpus = spread(
        docs.select(col("doc_id"), col("text")).unionByName(mutated))
      val wins = corpus
        .withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= w)
        .select(col("doc_id"), posexplode(expr(
          // the window hash is ONLY a grouping key (never output):
          // an 8-byte xxhash64 shuffles ~4x fewer bytes than the
          // md5 hex string at identical grouping (round-16 §2.3)
          s"transform(sequence(0, size(t) - $w)," +
            s" i -> xxhash64(array_join(slice(t, i + 1, $w), ' ')))")))
        .select(col("doc_id"), col("pos").as("idx"), col("col").as("h"))
      // "repeats across documents" only needs ≥2 DISTINCT docs per
      // window hash, and min(doc_id) ≠ max(doc_id) decides that with
      // constant per-group state. Round-17: decided on the VOCABULARY
      // side — the two-level (partial+final) min/max aggregate is
      // skew-safe by map-side combination, the h values that repeat
      // cross-doc form a small filtered table, and the stream keeps
      // only those via an AQE-managed equi-join (broadcast at bench
      // scale, skew-split shuffle beyond) — no corpus-wide
      // boilerplate window lands on one task (guide §2.2/§2.5/§3.1;
      // r16 ADVICE).
      val dup = graft.ext.SaltedAgg.filterKeys(wins, "h",
        Seq(col("doc_id"), col("idx")),
        Seq(min(col("doc_id")).as("p_mn"), max(col("doc_id")).as("p_mx")),
        Seq(min(col("p_mn")) -> "mn", max(col("p_mx")) -> "mx"),
        col("mn") =!= col("mx"))
      // islands: consecutive dup offsets share (idx - row_number)
      val grp = Window.partitionBy(col("doc_id")).orderBy(col("idx"))
      val spans = dup
        .withColumn("island", col("idx") - row_number().over(grp))
        .groupBy(col("doc_id"), col("island"))
        .agg(count(lit(1)).as("run"))
        .groupBy(col("doc_id"))
        .agg((max(col("run")) + (w - 1)).as("max_span_tokens"),
          sum(col("run")).as("n_dup_windows"))
      corpus.select(col("doc_id"))
        .join(spans, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
          coalesce(col("max_span_tokens"), lit(0L)).as("max_span_tokens"))
        .orderBy(col("doc_id"))
    }),

    // Exact repeated-substring REMOVAL — x55's detection carried to
    // the removal semantics large-scale dedup actually ships (the
    // "cut every ≥w-token run that repeats across documents, keep the
    // rest" grain): marked window offsets → merged cover intervals
    // (gaps-and-islands, an interval spans [island_min,
    // island_max+w−1]) → tokens inside any interval drop → the doc is
    // REBUILT from surviving tokens and fingerprinted. Planted
    // prefix-twins guarantee both the twin and its source lose their
    // shared prefix while unique tails survive.
    //
    // Scale shape: everything x55 does (linear hashing, one keyed
    // shuffle, islands window), plus per-doc interval lists (bounded
    // by the doc's own island count) collected into a HOF token
    // filter — a narrow map. The rebuild never shuffles anything
    // data-sized beyond the offsets it already had.
    "x65_span_removal" -> ((s, dir) => {
      val w = 10
      val docs = t(s, dir, "documents")
      val toks = Text.tokens(col("text"))
      val mutated = docs.select(
        (col("doc_id") + 10000L).as("doc_id"),
        array_join(slice(toks, lit(1), greatest(size(toks) - 3, lit(0))), " ")
          .as("text"))
      val corpus = spread(
        docs.select(col("doc_id"), col("text")).unionByName(mutated))
      val wins = corpus
        .withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= w)
        .select(col("doc_id"), posexplode(expr(
          // the window hash is ONLY a grouping key (never output):
          // an 8-byte xxhash64 shuffles ~4x fewer bytes than the
          // md5 hex string at identical grouping (round-16 §2.3)
          s"transform(sequence(0, size(t) - $w)," +
            s" i -> xxhash64(array_join(slice(t, i + 1, $w), ' ')))")))
        .select(col("doc_id"), col("pos").as("idx"), col("col").as("h"))
      val grp = Window.partitionBy(col("doc_id")).orderBy(col("idx"))
      // cross-doc repeat test decided on the vocabulary side — the
      // same two-level aggregate + AQE-managed semi-filter join as
      // x55 (round-17, guide §2.2/§2.5/§3.1)
      val spans = graft.ext.SaltedAgg.filterKeys(wins, "h",
          Seq(col("doc_id"), col("idx")),
          Seq(min(col("doc_id")).as("p_mn"), max(col("doc_id")).as("p_mx")),
          Seq(min(col("p_mn")) -> "mn", max(col("p_mx")) -> "mx"),
          col("mn") =!= col("mx"))
        .withColumn("island", col("idx") - row_number().over(grp))
        .groupBy(col("doc_id"), col("island"))
        .agg(min(col("idx")).as("s"), (max(col("idx")) + (w - 1)).as("e"))
        .groupBy(col("doc_id"))
        .agg(collect_list(struct(col("s"), col("e"))).as("spans"))
      corpus.join(spans, Seq("doc_id"), "left")
        .withColumn("t", Text.tokens(col("text")))
        .withColumn("kept", expr(
          "filter(t, (tok, i) -> spans IS NULL OR" +
            " NOT exists(spans, sp -> i >= sp.s AND i <= sp.e))"))
        .select(col("doc_id"),
          size(col("t")).cast("long").as("n_tokens"),
          (size(col("t")) - size(col("kept"))).cast("long").as("n_removed"),
          md5(array_join(col("kept"), " ")).as("clean_md5"))
        .orderBy(col("doc_id"))
    }),

    // DSIR-style hashed importance weights (Xie et al. 2023, "Data
    // Selection for Language Models via Importance Resampling"): score
    // every document by how target-domain-like its hashed unigram
    // distribution is — weight(doc) = Σ_tokens [ln p̂_target(b) −
    // ln p̂_raw(b)] where b is the token's feature-hash bucket (the
    // 256-bucket md5 idiom shared with x21's split) and both bucket
    // distributions are Laplace-smoothed (+1/bucket, so unseen buckets
    // are defined). The target here is the English slice; the raw
    // distribution is the whole corpus. High weight = looks like the
    // target; downstream selection samples ∝ weight.
    //
    // Determinism: ln is quantized to integer micro-units BEFORE any
    // summation (the x32/x54 idiom — libm vs DuckDB ln can differ in
    // the last ulp, rounding to 6 decimals makes both engines agree),
    // so each per-bucket log-ratio is an integer and the per-doc sum
    // is order-independent.
    //
    // Scale shape: one token explode feeding two bounded aggregates
    // (256-row bucket histograms) plus a 1-row total; the per-token
    // stream is pre-aggregated to (doc_id, bucket) counts — ≤256 rows
    // per doc regardless of length — before joining the broadcast
    // 256-row weight table, so the only data-sized shuffle is the
    // (doc_id, bucket) partial-aggregated one. Nothing in the plan
    // grows with corpus size except that single keyed aggregate.
    "x56_dsir_weights" -> ((s, dir) => {
      val B = 256
      val toks = spread(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"),
          explode(Text.tokens(col("text"))).as("token"))
        .withColumn("b", Sampling.hashBucket256(col("token")))
      // one pass builds BOTH histograms: raw count + conditional
      // target count per bucket (256 rows out); the totals then reduce
      // the histogram, not the token stream — the explode is scanned
      // once here and once for the per-doc counts, never a third time.
      // (r14 A/B, fresh-JVM min-of-3 at sf1: materializing the
      // (doc_id, lang, bucket) pre-aggregate once via localCheckpoint
      // so the explode runs a single time measured 8.2 s vs this
      // form's 2.38 s — the per-doc table is ~150 buckets × every doc,
      // corpus-sized, and writing it costs far more than re-running
      // the codegen'd explode pipeline from the parquet scan. Scan
      // twice, materialize never — kept.)
      val hist = toks.groupBy(col("b")).agg(
        count(lit(1)).as("c_r"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("c_t"))
      val totals = hist.agg(sum(col("c_t")).as("n_t"),
        sum(col("c_r")).as("n_r"))
      // dense 0..255 spine: every bucket gets a weight even if no
      // token hashed into it (smoothing makes the log defined)
      val weights = s.range(B).select(col("id").as("b"))
        .join(hist, Seq("b"), "left")
        .na.fill(0L, Seq("c_t", "c_r"))
        .crossJoin(broadcast(totals))
        .select(col("b"),
          (Drift.lpMicro(col("c_t") + 1, col("n_t") + B)
            - Drift.lpMicro(col("c_r") + 1, col("n_r") + B)).as("lw"))
      toks.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("cnt"))
        .join(broadcast(weights), "b")
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_tokens"),
          sum(col("cnt") * col("lw")).as("dsir_micro"))
        .orderBy(col("doc_id"))
    }),

    // Per-source adaptive quality gate: a single global quality cutoff
    // systematically over-prunes sources whose baseline style differs
    // (forum text scores lower than encyclopedia text on the same
    // axis) — so calibrate the threshold PER SOURCE: score every doc,
    // rank it within its source, and drop the bottom quartile of each
    // source independently. Score = distinct-token fraction in integer
    // micro-units (the repetition axis of x22, exact integer ratio so
    // both engines agree bit-for-bit); the gate is rank*4 > n_src —
    // pure integer arithmetic, no percentile interpolation to diverge.
    //
    // Scale shape: one narrow map for the score, then a single window
    // keyed on source (one shuffle); per-source rank and count ride
    // the same sort. Sources are the natural partition key and no
    // source's slice needs to fit anywhere special — the window spills
    // per-partition if a source is huge.
    "x57_source_quality_gate" -> ((s, dir) => {
      val scored = spread(t(s, dir, "documents"))
        .withColumn("t", Text.tokens(col("text")))
        .withColumn("n_tokens", size(col("t")).cast("long"))
        .withColumn("score",
          expr("CAST(size(array_distinct(t)) AS BIGINT) * 1000000" +
            " div n_tokens"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("score"), col("doc_id"))
      scored
        .withColumn("rnk", row_number().over(w).cast("long"))
        .withColumn("n_src",
          count(lit(1)).over(Window.partitionBy(col("source"))))
        .withColumn("keep", col("rnk") * 4 > col("n_src"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("score"), col("rnk"), col("keep"))
        .orderBy(col("doc_id"))
    }),

    // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    // deduplication in EMBEDDING space — cluster the corpus with
    // k-means, compare vectors only WITHIN their cluster, and keep one
    // representative per group of semantically near-identical vectors
    // (cosine ≥ τ). This is the embedding-space sibling of the MinHash
    // stack: LSH finds lexical near-dups, SemDeDup finds paraphrases
    // and re-encodings that share no surface text.
    //
    // Test corpus plants a near-identical variant of every vector
    // (coordinates quantized to the 2^-10 grid — cosine vs the
    // original ≈ 0.9999) under vec_id+100000; the pipeline must pair
    // each variant with its source and elect the lower id.
    //
    // Scale shape: the k-means fit is KMeansLite's bit-deterministic
    // quantized fit (driver state = k·d doubles, bounded); candidate
    // pairs are generated per CELL — k grows with the corpus so cell
    // population stays bounded and the pairwise stage is O(n·cell),
    // never O(n²); cluster election is the same hash-partitioned
    // label propagation as x23. Cosine is rounded to 6 decimals
    // before the τ compare so both engines gate identical pairs.
    "x58_semdedup" -> ((s, dir) => {
      val base = t(s, dir, "embeddings")
        .select(col("vec_id"), toD(col("embedding")).as("v"))
      val planted = base.select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("v"), x => round(x * 1024) / 1024).as("v"))
      // checkpoint the corpus AND the cell-assigned corpus (round-12,
      // the r11 verdict's x58 attribution task): without the second
      // materialization, ProjectCollapse inlines the toD/quantize
      // ARRAY TRANSFORMS into the self-join's output, so the pairing
      // filter re-derived both 64-element arrays PER CANDIDATE PAIR
      // (~20M times) instead of once per row — the whole 24 s of the
      // 29.5 s sf1 wall clock. Materialized arrays drop the query to
      // 4.2 s (stage table in PLANS.md); same values exactly.
      // checkpoint + count fused into ONE job (round-17,
      // GraftCheckpoint: Dataset.localCheckpoint materializes via a
      // count it discards; the corpusK sizing read re-counted it)
      val (corpus, nCorpus) = org.apache.spark.sql.GraftCheckpoint
        .checkpointWithCount(spread(base.unionByName(planted)))
      // k∝corpus (round-11): cells scale with the data, pair work
      // stays O(n·500) — see corpusK
      val k = corpusK(nCorpus)
      val cents = KMeansLite.fitQuantized(corpus, "vec_id", "v", k, iters = 1)
      val assigned = corpus.select(col("vec_id"), col("v"),
        KMeansLite.assign(col("v"), cents).as("cell")).localCheckpoint()
      val edges = assigned
        .select(col("cell"), col("vec_id").as("id_a"), col("v").as("va"))
        .join(assigned.select(col("cell"), col("vec_id").as("id_b"),
          col("v").as("vb")), "cell")
        .filter(col("id_a") < col("id_b"))
        .filter(round(Similarity.cosine(col("va"), col("vb")), 6)
          >= lit(0.99))
        .select(col("id_a"), col("id_b"))
      val comp = Components.connectedComponents(
        assigned.select(col("vec_id")), "vec_id", edges, "id_a", "id_b")
      val sizes = comp.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"))
      comp.join(sizes, "cluster_id")
        .select(col("vec_id"), col("cluster_id"), col("cluster_size"),
          (col("vec_id") === col("cluster_id")).as("keep"))
        .orderBy(col("vec_id"))
    }),

    // Product-quantization ADC search (Jégou et al. 2011, "Product
    // Quantization for Nearest Neighbor Search"): split each 64-dim
    // vector into m=4 16-dim subspaces, k-means each subspace to 16
    // codewords, and store every database vector as 4 small codes —
    // 4 bytes instead of 256. A query never touches the raw vectors:
    // it builds one 16-entry lookup table of partial squared distances
    // per subspace (m·k d2 evaluations), and each candidate's
    // approximate distance is 4 table lookups + 3 adds (Asymmetric
    // Distance Computation). This is the memory-bound regime ANN needs
    // at 100 TB: the code table is ~64× smaller than the vectors, so
    // the scan that decides the top-k streams codes, not floats.
    //
    // Determinism: each subspace quantizer is KMeansLite's
    // bit-deterministic fit (driver state m·k·16 doubles); LUT entries
    // are the same d2 doubles the x16 oracle already matches
    // bit-for-bit, summed in fixed subspace order, rounded to 6
    // decimals before ranking; ties break to the lowest neighbor id.
    //
    // Scale shape: the probe side (20 queries × 4 LUTs of 16 doubles)
    // is a bounded broadcast spine — the flagged BNLJ is the x44
    // scalar-broadcast shape, never data × data; the code scan is one
    // narrow pass over n rows; top-k is a per-query window.
    "x59_pq_adc" -> ((s, dir) => {
      val m = 4; val sub = 16; val k = 16; val topK = 5; val nQ = 20
      val base = spread(t(s, dir, "embeddings"))
        .select(col("vec_id"), toD(col("embedding")).as("v"))
        .localCheckpoint()
      // the m subspace fits are FUSED into one seed collect + one
      // unioned update job (round-17, guide §2.6): bit-identical
      // centroids (KMeansSlicedSpec), ~2 jobs where the concurrent
      // per-fit form paid 2m launches + AQE round-trips
      val cents: Seq[Seq[Seq[Double]]] = KMeansLite.fitQuantizedSliced(
        base, "vec_id", "v",
        (0 until m).map(j => (j * sub + 1, sub, k)), iters = 1)
      val codes = base.select(
        col("vec_id").as("neighbor_id") +:
          (0 until m).map(j => KMeansLite.assign(
            slice(col("v"), j * sub + 1, sub), cents(j)).as(s"code_$j")): _*)
      val probes = base.filter(col("vec_id") < nQ).select(
        col("vec_id").as("query_id") +:
          (0 until m).map(j => KMeansLite.cellDistances(
            slice(col("v"), j * sub + 1, sub), cents(j)).as(s"lut_$j")): _*)
      val adc6 = round((0 until m)
        .map(j => element_at(col(s"lut_$j"), col(s"code_$j") + 1))
        .reduce(_ + _), 6)
      val wRank = Window.partitionBy(col("query_id"))
        .orderBy(col("adc6"), col("neighbor_id"))
      codes.crossJoin(broadcast(probes))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("adc6", adc6)
        .withColumn("rnk", row_number().over(wRank).cast("long"))
        .filter(col("rnk") <= topK)
        .select(col("query_id"), col("rnk"), col("neighbor_id"),
          col("adc6").as("adc_d2"))
        .orderBy(col("query_id"), col("rnk"))
    }),

    // Per-document n-gram novelty: how much does each doc ADD to the
    // corpus, in distinct 5-gram windows whose first occurrence
    // (lowest doc_id — arrival order proxy) is this doc? The
    // selection-priority metric dedup-aware curation ranks by: a doc
    // whose windows all appeared earlier contributes nothing even if
    // no single document duplicates it whole. Planted full copies
    // (doc_id+10000) must score exactly zero novel windows — the
    // original claims every window first.
    //
    // Scale shape: per-doc DISTINCT windows ride the explode as
    // 8-byte hashes; first-claim is a two-level (partial+final,
    // skew-safe) min on the window hash whose vocabulary-sized
    // output re-aggregates per doc — no stream join-back, no window.
    // Nothing quadratic, nothing driver-side.
    "x60_ngram_novelty" -> ((s, dir) => {
      val w = 5
      val docs = t(s, dir, "documents")
      val corpus = spread(docs.select(col("doc_id"), col("text"))
        .unionByName(docs.select((col("doc_id") + 10000L).as("doc_id"),
          col("text"))))
      val wins = corpus.withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= w)
        .select(col("doc_id"), explode(expr(
          // grouping-only key: 8-byte xxhash64, not an md5 hex (x55)
          s"array_distinct(transform(sequence(0, size(t) - $w)," +
            s" i -> xxhash64(array_join(slice(t, i + 1, $w), ' '))))")).as("h"))
      // Round-17: no stream attach at all. n_novel(doc) = number of
      // window hashes whose corpus-wide min(doc_id) IS this doc — a
      // per-doc COUNT over the first-claim table itself, so the
      // two-level (partial+final, skew-safe) min aggregate's
      // vocabulary-sized output is aggregated again instead of being
      // joined back to the corpus stream; n_distinct_ngrams is a
      // plain per-doc count. The corpus-wide boilerplate window the
      // r16 window form serialized onto one task never rides a
      // window operator anywhere (guide §2.2/§2.3).
      val novel = wins.groupBy(col("h"))
        .agg(min(col("doc_id")).as("first_doc"))
        .groupBy(col("first_doc")).agg(count(lit(1)).as("n_novel"))
        .select(col("first_doc").as("doc_id"), col("n_novel"))
      val scored = wins.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_distinct_ngrams"))
        .join(novel, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_distinct_ngrams"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      corpus.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_distinct_ngrams"), lit(0L)).as("n_distinct_ngrams"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          coalesce(expr("n_novel * 1000000 div n_distinct_ngrams"), lit(0L))
            .as("novelty_ppm"))
        .orderBy(col("doc_id"))
    }),

    // Embedding-space outlier detection: vectors far from their
    // k-means centroid are encoder glitches, garbled inputs, or
    // genuinely rare content — either way the rows a curation pass
    // inspects first. Flag the top ~5% by centroid distance WITHIN
    // each cell (a global cutoff would just flag whole sparse cells).
    // The flag is ext/Outliers' shared rank rule (ties at the 6-dp
    // boundary flag all-or-none) — one definition with the streaming
    // monitor's exported calibration, so the two cannot drift.
    //
    // Scale shape: one narrow assign pass (k d2 evaluations per row),
    // one cell-keyed window for rank + population. Cells are the
    // partition key — and therefore the WINDOW's parallelism, so k
    // rides corpusK (round-16): a literal 16 kept the whole corpus's
    // rank sort on 16 partitions forever; cells ∝ corpus keep ~500
    // rows per window partition at any scale.
    "x61_embed_outliers" -> ((s, dir) => {
      // checkpoint + corpus count in one job (round-17, GraftCheckpoint)
      val (base, nBase) = org.apache.spark.sql.GraftCheckpoint
        .checkpointWithCount(spread(t(s, dir, "embeddings"))
          .select(col("vec_id"), toD(col("embedding")).as("v")))
      val cents = KMeansLite.fitQuantized(base, "vec_id", "v",
        corpusK(nBase), iters = 1)
      graft.ext.Outliers.scored(base, "vec_id", "v", cents)
        .select(col("vec_id"), col("cell"), col("d2_6"), col("rnk"),
          col("pop"), col("outlier"))
        .orderBy(col("vec_id"))
    }),

    // Cluster-balanced resampling (the D4 recipe, Tirumala et al.
    // 2023: cluster the corpus in embedding space, then flatten the
    // cluster-size distribution so a few mega-clusters of
    // boilerplate don't dominate training). Each cluster keeps at
    // most its fair share (total/k): a keep-rate in 256ths is derived
    // per cluster and membership is the deterministic md5 bucket of
    // the vec_id — pure integer arithmetic end to end, no rand().
    //
    // Scale shape: assign is a narrow map; cluster sizes are a k-row
    // aggregate broadcast back; the keep decision is per-row local.
    // The sample is reproducible from ids alone — rerunning on a
    // grown corpus keeps decisions stable for unchanged clusters.
    "x62_cluster_balance" -> ((s, dir) => {
      val k = 8
      val base = spread(t(s, dir, "embeddings"))
        .select(col("vec_id"), toD(col("embedding")).as("v"))
        .localCheckpoint()
      val cents = KMeansLite.fitQuantized(base, "vec_id", "v", k, iters = 1)
      val assigned = base.select(col("vec_id"),
        KMeansLite.assign(col("v"), cents).cast("long").as("cell"))
      val sizes = assigned.groupBy(col("cell"))
        .agg(count(lit(1)).as("pop"))
      val total = sizes.agg(sum(col("pop")).as("total"))
      assigned.join(broadcast(sizes), "cell")
        .crossJoin(broadcast(total))
        // fair share per cluster in 256ths of the cluster: capped at
        // 256 (keep all of an under-represented cluster)
        .withColumn("cap256",
          least(expr(s"(total div $k) * 256 div pop"), lit(256L)))
        .withColumn("keep",
          Sampling.hashBucket256(col("vec_id")) < col("cap256"))
        .select(col("vec_id"), col("cell"), col("pop"), col("cap256"),
          col("keep"))
        .orderBy(col("vec_id"))
    }),

    // Exact-quota stratified eval split: hold out exactly ⌈pop/20⌉
    // docs (5%) from EVERY (source, lang) stratum, chosen by md5
    // order. x21's hash split holds its ratio only in expectation —
    // on a small stratum it can starve the holdout to zero — while an
    // evaluation set needs every stratum represented with an exact,
    // reproducible quota (the difference between "5% of the corpus"
    // and "5% of each slice you report metrics on").
    //
    // Scale shape: one window keyed on the stratum (rank and
    // population ride the same sort); membership depends only on
    // (stratum, md5(doc_id)), so re-running on a grown corpus moves
    // as few docs as the quota arithmetic forces.
    "x63_stratified_eval" -> ((s, dir) => {
      val strat = Window.partitionBy(col("source"), col("lang"))
      val docs = spread(t(s, dir, "documents"))
      docs
        .withColumn("rnk", row_number().over(
          strat.orderBy(md5(col("doc_id").cast("string")), col("doc_id")))
          .cast("long"))
        .withColumn("pop", count(lit(1)).over(strat))
        .withColumn("quota", expr("(pop + 19) div 20"))
        .withColumn("split",
          when(col("rnk") <= col("quota"), "eval").otherwise("train"))
        .select(col("doc_id"), col("source"), col("lang"), col("rnk"),
          col("pop"), col("quota"), col("split"))
        .orderBy(col("doc_id"))
    }),

    // Token-budget-constrained selection: keep the highest-quality
    // documents whose tokens fit a fixed training budget. The naive
    // formulation — order the whole corpus by score and take a global
    // running token sum — is a single-partition sort, the classic
    // scale-killer. The scalable shape used here exploits the score's
    // integer micro-unit domain (≤ 1e6+1 distinct values REGARDLESS of
    // corpus size): aggregate token mass per score value, run the
    // cumulative over that bounded table (a legal single-partition
    // window — its size is fixed by the quantization, not the data),
    // and broadcast back three verdicts: scores wholly inside the
    // budget, wholly outside, and the ONE straddling score, whose docs
    // are then ranked by md5 and absorbed until the budget is exact.
    // (If the boundary tie-set itself were huge, the same trick
    // recurses on md5 buckets; at this grain a single score group is
    // the per-key load every keyed window already bears.)
    "x64_token_budget_select" -> ((s, dir) => {
      val budget = 10000L
      val docs = spread(t(s, dir, "documents"))
        .withColumn("t", Text.tokens(col("text")))
        .withColumn("n_tokens", size(col("t")).cast("long"))
        .withColumn("score",
          expr("CAST(size(array_distinct(t)) AS BIGINT) * 1000000" +
            " div n_tokens"))
        .select(col("doc_id"), col("n_tokens"), col("score"))
      val byScore = docs.groupBy(col("score"))
        .agg(sum(col("n_tokens")).as("mass"))
      val wS = Window.orderBy(col("score").desc)
      val marked = byScore
        .withColumn("cum_before", sum(col("mass")).over(wS) - col("mass"))
        .withColumn("grp",
          when(col("cum_before") + col("mass") <= budget, "full")
            .when(col("cum_before") < budget, "boundary")
            .otherwise("out"))
        .select(col("score"), col("cum_before"), col("grp"))
      val joined = docs.join(broadcast(marked), "score")
      // the running sum exists ONLY for the one straddling score's
      // docs — full/out rows never enter a window, so no corpus-sized
      // single-partition frame is ever built
      val wB = Window
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      val boundary = joined.filter(col("grp") === "boundary")
        .withColumn("keep",
          col("cum_before") + sum(col("n_tokens")).over(wB) <= budget)
      joined.filter(col("grp") =!= "boundary")
        .withColumn("keep", col("grp") === "full")
        .unionByName(boundary)
        .select(col("doc_id"), col("n_tokens"), col("score"), col("keep"))
        .orderBy(col("doc_id"))
    }),

    // CCNet-style per-language quality bucketing: score every document
    // with the corpus-unigram mean logprob (x32's integer micro-unit
    // arithmetic, so the ranking key is bit-stable cross-engine), then
    // split EACH LANGUAGE into head/middle/tail thirds by rank — the
    // "keep head+middle, drop tail" perplexity filter of the CCNet /
    // RedPajama pipelines, where bucketing within language (not
    // globally) is what stops the filter from simply deleting the
    // low-resource languages.
    //
    // Determinism: sum_e6 is an exact integer; avg = sum/(n·1e6) is ONE
    // IEEE division (correctly rounded, unlike ln) so both engines rank
    // identical doubles, with doc_id as total tie-break. Bucket edges
    // use integer arithmetic (rn·3 ≤ n), not ntile, so edge semantics
    // can't diverge.
    //
    // Scale shape: vocab join as in x32 (AQE broadcasts while it
    // fits). The round-7 form ranked every document through a
    // lang-keyed window — correct, but a giant language (English is
    // half of any web corpus) puts billions of rows through ONE window
    // partition. Round 8 applies the x64 bounded-domain trick: the
    // score domain is 6-decimal-quantized (≤ ~2e7 distinct values
    // regardless of corpus size), so the per-language (score → count)
    // HISTOGRAM is what gets the cumulative window — rows bounded by
    // the score domain, never by documents. Whole score classes map to
    // their bucket from class-span arithmetic; only the ≤ 2 classes
    // per language that STRADDLE a bucket edge get an in-class window
    // (keyed by lang+score) to realize the doc_id tie-break — the same
    // "boundary window sees one score class" posture PlanAudit already
    // adjudicates for x64. Degenerate all-one-score languages make the
    // boundary class the whole language, but that cost is inherent to
    // the rank-with-tie-break SEMANTICS, not this plan.
    //
    // Round-12 (sf1 A/B, 4.62 → 1.93 s): toks is localCheckpoint'd —
    // it fed vocab, the corpus total AND the per-doc score join, so
    // the explode ran 3×; the corpus total is now a vocab-sized
    // sum(c), not a token-table read (2.28 → 1.93); the small perDoc
    // checkpoint collapses the histogram/bucket-join double read.
    // Tried and rejected: forced broadcast(vocab) (flat — AQE already
    // broadcasts it) and vocab-grain log computation (4.6 s — the
    // crossJoin under the build side defeats the broadcast).
    "x66_ccnet_buckets" -> ((s, dir) => {
      val toks = spread(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"),
          explode(Text.tokens(col("text"))).as("token"))
        .localCheckpoint() // read 2x: vocab, per-doc score join
      val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
      // corpus token total = sum of vocab counts — a vocab-sized agg,
      // not a third read of the token table
      val total = vocab.agg(sum(col("c")).as("total"))
      val perDoc = toks
        .join(vocab, "token")
        .crossJoin(broadcast(total))
        .withColumn("lp6_e6",
          round(round(log(col("c").cast("double")
            / col("total").cast("double")), 6) * 1e6).cast("long"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("lp6_e6")).as("sum_e6"))
        .withColumn("avg_logp",
          round(col("sum_e6").cast("double")
            / (col("n_tokens") * 1000000L).cast("double"), 6))
        .localCheckpoint() // feeds the histogram AND the bucket join
      // bounded-domain histogram: one row per (lang, distinct score)
      val wH = Window.partitionBy(col("lang"))
      val hist = perDoc.groupBy(col("lang"), col("avg_logp"))
        .agg(count(lit(1)).as("cls_n"))
        .withColumn("cum_before",
          coalesce(sum(col("cls_n")).over(
            wH.orderBy(col("avg_logp").desc)
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n_docs", sum(col("cls_n")).over(wH))
        // head = positions 1..floor(n/3), middle = ..floor(2n/3)
        .withColumn("h_edge", floor(col("n_docs") / 3))
        .withColumn("m_edge", floor(col("n_docs") * 2 / 3))
        .withColumn("cls_bucket",
          when(col("cum_before") + col("cls_n") <= col("h_edge"), "head")
            .when(col("cum_before") >= col("h_edge")
              && col("cum_before") + col("cls_n") <= col("m_edge"), "middle")
            .when(col("cum_before") >= col("m_edge"), "tail")
            .otherwise("boundary"))
        .select(col("lang"), col("avg_logp"), col("cum_before"),
          col("h_edge"), col("m_edge"), col("cls_bucket"))
      val joined = perDoc.join(hist, Seq("lang", "avg_logp"))
      // only edge-straddling classes rank their docs; the window is
      // keyed by (lang, score) — one score class per partition
      val wC = Window.partitionBy(col("lang"), col("avg_logp"))
        .orderBy(col("doc_id"))
      val boundary = joined.filter(col("cls_bucket") === "boundary")
        .withColumn("pos", col("cum_before") + row_number().over(wC))
        .withColumn("bucket",
          when(col("pos") <= col("h_edge"), "head")
            .when(col("pos") <= col("m_edge"), "middle")
            .otherwise("tail"))
      joined.filter(col("cls_bucket") =!= "boundary")
        .withColumn("bucket", col("cls_bucket"))
        .unionByName(boundary.drop("pos"))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("avg_logp"), col("bucket"))
        .orderBy(col("doc_id"))
    }),

    // PPJoin-style set-similarity self-join with PREFIX FILTERING — the
    // exact-Jaccard join that scales without MinHash's approximation:
    // order every document's distinct trigram shingles (x02's set
    // grain — unigram sets are useless under a small vocabulary, where
    // every doc's token SET converges to the whole alphabet) by global
    // rarity (df asc, shingle asc — one total order shared by all
    // docs), keep only the first |d| − ceil(t·|d|) + 1 shingles as the
    // doc's "prefix", and generate candidates from the prefix equi-
    // join. The prefix theorem guarantees completeness: two sets with
    // Jaccard ≥ t MUST share a prefix element under a common order, so
    // unlike LSH (x02) there are no false negatives — this is the
    // exact counterpart the x36 fidelity audit measures LSH against.
    // Rarity order keeps candidates sparse: prefixes hold each doc's
    // least common shingles, the LIGHT tail of the df distribution.
    //
    // Scale shape: shingle+distinct is narrow; the df join is x32's
    // vocab shape; the per-doc ordering window is keyed on doc_id
    // (per-group size = doc shingle count, bounded); candidates come
    // ONLY from the prefix equi-join plus the t·|larger| ≤ |smaller|
    // length prune; exact intersection counts ride a shingle equi-join
    // on the candidate pairs. Every stage is an equi-join or keyed
    // window — no n² anywhere. The ≥-threshold test is pure integer
    // arithmetic (inter·5 ≥ union·3), immune to float boundaries.
    "x67_prefix_filter_join" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks0 = Text.tokens(col("text"))
      val mutated = docs.select(
        (col("doc_id") + 10000).as("doc_id"),
        array_join(slice(toks0, lit(1), greatest(size(toks0) - 3, lit(0))), " ")
          .as("text"))
      val corpus = spread(
        docs.select(col("doc_id"), col("text")).unionByName(mutated))
      // each doc CARRIES its shingle array (x02's shape): the exact
      // intersection later is two doc-keyed joins + one codegen'd
      // array_intersect per candidate pair — never the pair×token
      // explode, whose shuffle is |cand|·|doc| rows and measured 20×
      // slower here
      // hs: the shingle set hashed ONCE per doc to a sorted int64
      // array — the verify join below carries 29M candidate rows at
      // 40× corpus (SCALE-SF10), and hauling ~25-byte shingle strings
      // per candidate plus a per-pair HashSet was 174 of its 226 s;
      // 8-byte sorted hashes + the native merge-count do the same
      // distinct-overlap arithmetic (collision odds ≈ |s|²/2⁶⁴ per
      // pair; RoundThirteenCSpec pins hashed == string corpus-wide)
      val sh = corpus
        .withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), Text.wordShingles(col("t")).as("s"))
        .withColumn("n", size(col("s")).cast("long"))
        .withColumn("hs", graft.ext.Dedup.sortedHashedShingles(col("s")))
      // the canonical PPJoin order rides the 8-byte token hash: the
      // prefix-filter guarantee (a θ-pair shares ≥1 prefix token) and
      // the positional bound hold for ANY consistent total order, and
      // the final pair set is decided by the exact hs verify — so
      // ordering by (df, xxhash64) instead of (df, string) changes
      // only the candidate mass, never the output, while the freq
      // aggregate, the df join and the prefix self-join all shuffle
      // longs instead of shingle strings (round-16, guide §2.3)
      val ex = sh.select(col("doc_id"), col("n"),
        explode(col("s")).as("tok0"))
        .select(col("doc_id"), col("n"), xxhash64(col("tok0")).as("token"))
      val freq = ex.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val wD = Window.partitionBy(col("doc_id"))
      val ordered = ex.join(freq, "token")
        .withColumn("ord", row_number().over(
          wD.orderBy(col("df"), col("token"))).cast("long"))
      // prefix length |d| − ceil(0.6·|d|) + 1, with ceil(3n/5) done in
      // exact integer form — positive n, so div is floor = the ceil
      // identity (3n+4) div 5
      val prefix = ordered
        .filter(col("ord") <= col("n") - expr("(3*n + 4) div 5") + 1L)
        .select(col("doc_id"), col("token"), col("n"), col("ord"))
      // POSITIONAL filter (the rest of Ppjoin beyond the prefix
      // filter, Xiao et al. 2008): a matched token at ordinals (i, j)
      // of the two globally-ordered lists bounds the overlap by
      // 1 + min(na−i, nb−j) — valid and loosest at the pair's FIRST
      // common token, so keeping pairs where ANY match row passes is
      // exhaustive for the θ = 0.6 threshold (inter ≥ ⌈3(na+nb)/8⌉).
      // SCALE-SF10 measured why it matters: the small-vocab corpus
      // yields 34M prefix-match rows for 240k true pairs, and the
      // positional bound prunes most of them BEFORE distinct+verify.
      val cand = prefix.as("a").join(prefix.as("b"),
          col("a.token") === col("b.token")
            && col("a.doc_id") < col("b.doc_id"))
        .filter(least(col("a.n"), col("b.n")) * 5
          >= greatest(col("a.n"), col("b.n")) * 3)
        .filter(lit(1L) + least(col("a.n") - col("a.ord"),
            col("b.n") - col("b.ord"))
          >= ((col("a.n") + col("b.n")) * 3 + 7).cast("long")
            .divide(8).cast("long"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .distinct()
      cand
        .join(sh.select(col("doc_id").as("doc_a"), col("hs").as("ha")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("hs").as("hb")), "doc_b")
        .withColumn("inter",
          graft.ext.Dedup.sortedIntersectSize(col("ha"), col("hb")))
        .filter(col("inter") * 5 >= (col("na") + col("nb") - col("inter")) * 3)
        .select(col("doc_a"), col("doc_b"), col("inter"),
          round(col("inter").cast("double")
            / (col("na") + col("nb") - col("inter")).cast("double"), 4)
            .as("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Leakage-free temporal train/test split over events: each user's
    // LAST ceil(20%) of events (by event time) become the held-out
    // set — the split an evaluation of a recommender / next-event model
    // needs, where a random split (x21) would leak the future into
    // training. The assignment is a pure function of the per-user event
    // order, so re-running on a grown table moves the boundary forward
    // deterministically.
    //
    // Scale shape: ONE window keyed on user_id (rank + count share the
    // same shuffle); no join, no global sort except the oracle-ordered
    // output. Per-user event counts bound the window state.
    "x68_temporal_split" -> ((s, dir) =>
      spread(t(s, dir, "events"))
        .withColumn("rn_desc", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ts").desc, col("event_id").desc)).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("user_id"))))
        .withColumn("split",
          when(col("rn_desc") <= expr("(n + 4) div 5"), "test")
            .otherwise("train"))
        .select(col("event_id"), col("user_id"), col("ts"), col("split"))
        .orderBy(col("event_id"))),

    // Corpus Zipf-slope fit — the one-number corpus health check (a
    // natural-language corpus fits ln f ≈ a + s·ln r with s ≈ −1;
    // boilerplate floods or truncation damage bend the curve): least
    // squares of ln(freq) on ln(rank) over the full vocabulary.
    //
    // Determinism: ln is quantized to integer micro-units per point
    // (x32's rule); the five regression sums then accumulate those
    // integers EXACTLY in DECIMAL(38,0) (long would overflow at
    // realistic vocabulary sizes: Σx² ≈ 2e14·|V|), and the closed-form
    // slope does a single correctly-rounded double division at the end.
    // DECIMAL(38,0) headroom: the final terms n·sxy and sx·sy reach
    // ~|V|²·6e14, which stays inside precision 38 up to |V| ≈ 1e11
    // distinct tokens — beyond that the products overflow to NULL
    // (Spark caps decimal precision at 38; DuckDB's HUGEINT does not),
    // so the exactness claim carries an explicit ~1e11-vocab bound.
    //
    // Scale shape (round 8 — no vocabulary-sized window anywhere): the
    // regression sums are INVARIANT to which token of a frequency tie
    // class gets which rank (y6 is constant within the class, so every
    // sum only sees the RANK MULTISET {base+1..base+m} of each class).
    // That license turns the global vocab rank into three bounded
    // pieces: (1) a cumulative over the FREQUENCY HISTOGRAM — its row
    // count D obeys D ≤ √(2N) (distinct counts c₁<…<c_D each occur, so
    // N ≥ Σcᵢ ≥ D(D+1)/2): ~4.5e6 rows even at N=1e13 token
    // occurrences, a legal bounded-domain single-partition window in
    // x64's class; (2) per-class salt offsets (≤ D·64 rows, windowed
    // PER CLASS over ≤64 salt buckets); (3) the within-(class,salt)
    // rank — a KEYED window whose largest partition is the hapax class
    // over 64 salts (the salt count is the knob: scale it with
    // corpus/target-partition-size). rn is then a valid permutation of
    // 1..|V| that is class-exact, so the one output row is bit-identical
    // to the lexicographic ranking the oracle computes.
    "x69_zipf_slope" -> ((s, dir) => {
      val salts = 64
      val toks = spread(t(s, dir, "documents"))
        .select(explode(Text.tokens(col("text"))).as("token"))
      val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
        .withColumn("salt", pmod(xxhash64(col("token")), lit(salts.toLong)))
      val sub = vocab.groupBy(col("c"), col("salt"))
        .agg(count(lit(1)).as("cnt"))
      val bases = sub.groupBy(col("c")).agg(sum(col("cnt")).as("m"))
        .withColumn("base",
          sum(col("m")).over(Window.orderBy(col("c").desc)) - col("m"))
        .select(col("c"), col("base"))
      val offs = sub
        .withColumn("soff",
          sum(col("cnt")).over(
            Window.partitionBy(col("c")).orderBy(col("salt"))) - col("cnt"))
        .join(bases, "c")
        .select(col("c"), col("salt"), (col("base") + col("soff")).as("off"))
      val pts = vocab
        .withColumn("tr", row_number().over(
          Window.partitionBy(col("c"), col("salt")).orderBy(col("token")))
          .cast("long"))
        .join(offs, Seq("c", "salt"))
        .withColumn("rn", col("off") + col("tr"))
        .select(
          expr("CAST(round(round(ln(CAST(rn AS DOUBLE)), 6) * 1e6) AS BIGINT)")
            .as("x6"),
          expr("CAST(round(round(ln(CAST(c AS DOUBLE)), 6) * 1e6) AS BIGINT)")
            .as("y6"))
      pts
        .agg(
          count(lit(1)).as("n_points"),
          sum(col("x6").cast("decimal(38,0)")).as("sx"),
          sum(col("y6").cast("decimal(38,0)")).as("sy"),
          sum((col("x6") * col("y6")).cast("decimal(38,0)")).as("sxy"),
          sum((col("x6") * col("x6")).cast("decimal(38,0)")).as("sxx"))
        .select(col("n_points"),
          round((col("n_points") * col("sxy") - col("sx") * col("sy"))
            .cast("double")
            / (col("n_points") * col("sxx") - col("sx") * col("sx"))
              .cast("double"), 4).as("zipf_slope"))
    }),

    // Fixed-iteration PageRank over the part–supplier order-flow graph
    // — the canonical iterative-join workload (centrality over a
    // bipartite supply network, here; over a hyperlink/citation graph
    // in a web-corpus pipeline, where rank feeds crawl prioritization
    // and quality weighting). Spark-first: the iteration is UNROLLED
    // into the logical plan — 5 rounds, each ONE rank⋈edges equi-join
    // hash-partitioned on the node id plus one partial-aggregated sum
    // — the exact shape GraphX/Pregel lowers to, with no driver-side
    // state at all (contrast KMeansLite's documented k·d exception).
    //
    // Determinism: ranks live in integer micro-units. Each round
    // divides by degree with integer `div` (floor — all values
    // positive, so Spark's truncation and DuckDB's floor agree), sums
    // INTEGERS (order-independent), and applies 0.15 + 0.85·x as
    // 150000 + (850·m) div 1000 — bit-exact cross-engine with no
    // float anywhere. Node encoding 2·part / 2·supp+1 keeps one id
    // space; both directions of each edge are materialized so the
    // bipartite walk is symmetric.
    //
    // Round-11 structural rework (was 15 s vs DuckDB 2.6 s at sf1 —
    // the unrolled plan re-derived the 6M-row lineitem DISTINCT and
    // the degree aggregate inside EVERY round's subtree; exchange
    // reuse does not cover them across the rank-lineage chain, and
    // localCheckpoint partitioning is invisible to EnsureRequirements
    // under AQE).
    //
    // Round-17 (the r16 verdict's scale-safety item): the round-11
    // form BROADCAST a node-sized contribution table every round
    // (plus the degree table) — bounded by the catalog here, but a
    // broadcast-per-round of anything |V|-sized violates guide §3.1
    // the moment |V| outgrows executor memory, and each round's
    // broadcast build was its own job + AQE re-plan. The loop now
    // runs on CO-PARTITIONED RDDs (the Components.connectedComponents
    // discipline, guide §2.4): the deduped adjacency (dst, nbrs[])
    // is hash-partitioned ONCE and persisted; ranks live under the
    // SAME partitioner, so the per-round rank⋈adjacency join is
    // narrow on both sides and the round's only shuffle is the
    // dst-keyed message reduction (map-side-combined, |V|-sized).
    // Nothing is broadcast, nothing is collected; per-round arithmetic
    // is unchanged exact-integer (rank div deg, then
    // 150000 + (850·m) div 1000 — Long ops, order-independent sums),
    // so the emitted ranks are bit-identical to the broadcast form.
    "x70_graph_pagerank" -> ((s, dir) => {
      val n = s.sparkContext.defaultParallelism
      val eRaw = t(s, dir, "lineitem")
        .select((col("l_partkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      // ONE corpus exchange builds the dst-clustered adjacency —
      // repartition(dst) satisfies both downstream groupings (pair
      // dedup + collect_list), then the |V| array rows drop to an RDD
      // hash-partitioned on the node id and persist there.
      val adjDf = eRaw.unionByName(
        eRaw.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(n, col("dst"))
        .groupBy(col("dst"), col("src")).agg(count(lit(1)).as("_dup"))
        .groupBy(col("dst")).agg(collect_list(col("src")).as("nbrs"))
      val part = new org.apache.spark.HashPartitioner(n)
      val adj = adjDf.rdd.map(r =>
          (r.getLong(0), r.getSeq[Long](1).toArray))
        .partitionBy(part)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // every node in the symmetrized graph has deg >= 1, sends a
      // contribution each round, and (symmetry) receives >= 1 message
      // — the id set is closed, no outer-join seeding needed
      var rank: org.apache.spark.rdd.RDD[(Long, Long)] =
        adj.mapPartitions(_.map { case (node, _) => (node, 1000000L) },
          preservesPartitioning = true)
      for (_ <- 1 to 5) {
        // co-partitioned round: ranks and adjacency zip partition-by-
        // partition (no join shuffle), contributions combine into a
        // per-partition map BEFORE the shuffle (a manual map-side
        // combine — the flatMap+reduceByKey form allocated a boxed
        // tuple per EDGE per round), so the round's one shuffle
        // carries ≤|V| combined entries per partition.
        val combined = adj.zipPartitions(rank) { (ait, rit) =>
          val rmap = new java.util.HashMap[Long, Long]()
          while (rit.hasNext) { val kv = rit.next(); rmap.put(kv._1, kv._2) }
          val acc = new java.util.HashMap[Long, Long]()
          while (ait.hasNext) {
            val kv = ait.next()
            val nbrs = kv._2
            val c = rmap.get(kv._1) / nbrs.length // rank div deg, positive
            var i = 0
            while (i < nbrs.length) {
              acc.put(nbrs(i), acc.getOrDefault(nbrs(i), 0L) + c)
              i += 1
            }
          }
          import scala.jdk.CollectionConverters._
          acc.entrySet().iterator().asScala
            .map(e => (e.getKey.longValue(), e.getValue.longValue()))
        }
        rank = combined.reduceByKey(part, (a: Long, b: Long) => a + b)
          .mapValues(m => 150000L + (850L * m) / 1000L)
      }
      val out = adj.join(rank, part).map { case (node, (nbrs, rk)) =>
        org.apache.spark.sql.Row(node, nbrs.length.toLong, rk)
      }
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      s.createDataFrame(out, StructType(Seq(
          StructField("node", LongType, nullable = false),
          StructField("deg", LongType, nullable = false),
          StructField("rank", LongType, nullable = false))))
        .select(
          when(col("node") % 2 === 0, "part").otherwise("supplier")
            .as("node_type"),
          expr("node div 2").as("key"), col("deg"), col("rank"))
        .orderBy(col("node_type"), col("key"))
    }),

    // Gopher/MassiveText-style rule-based quality gate — the cheap
    // heuristic bundle every pretraining pipeline runs BEFORE any
    // model-based scoring: word count bounds, mean word length, a
    // minimum stopword presence (prose-ness), and a symbol-character
    // ceiling. Every signal is integer arithmetic (×100 / ppm
    // quantization), so the pass verdict is bit-stable cross-engine
    // and immune to float boundaries. One narrow projection — no
    // shuffle at all until the oracle-ordered output.
    "x71_gopher_rules" -> ((s, dir) =>
      spread(t(s, dir, "documents"))
        .withColumn("t", Text.tokens(col("text")))
        .withColumn("n_words", size(col("t")).cast("long"))
        // mean word length ×100: total non-space chars over words
        .withColumn("mwl100",
          expr("(CAST(length(regexp_replace(text, '\\\\s', '')) AS BIGINT)" +
            " * 100) div n_words"))
        .withColumn("stop_count", Text.stopwordCount(col("t")))
        // greatest(len, 1) pins the empty-text document to sym_ppm = 0
        // instead of a silent NULL from the zero divisor (it still
        // fails the gate via n_words)
        .withColumn("sym_ppm",
          expr("(CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', ''))" +
            " AS BIGINT) * 1000000)" +
            " div greatest(CAST(length(text) AS BIGINT), 1)"))
        .withColumn("pass",
          col("n_words").between(50, 100000)
            && col("mwl100").between(300, 1000)
            && col("stop_count") >= 2
            && col("sym_ppm") <= 100000)
        .select(col("doc_id"), col("n_words"), col("mwl100"),
          col("stop_count"), col("sym_ppm"), col("pass"))
        .orderBy(col("doc_id"))),

    // IVF+PQ composed ANN index — the billion-scale production shape
    // assembled from parts already proven separately: x16's trained
    // coarse quantizer shortlists nProbe cells per query, x59's product
    // quantizer scans ONLY the shortlisted cells with 4-byte codes and
    // per-query lookup tables (ADC), and the result is audited row by
    // row against the exact brute-force top-k (`exact_hit` — recall@k
    // is its per-query mean; RoundEightSpec pins the bound). This is
    // the whole point of the composition: the coarse index bounds the
    // candidate COUNT (cells, not corpus), PQ bounds the candidate
    // WIDTH (4 bytes, not 256), so the scan that decides the top-k
    // touches ~nProbe/k of the corpus at ~1/64 the bytes.
    //
    // Determinism: both quantizer fits are KMeansLite's bit-exact
    // grid-quantized Lloyd step (driver state (kc + m·kq)·dims doubles,
    // bounded); LUT entries and the exact-leg distances use the same
    // zip_with/aggregate left-fold the x16/x59 oracles already match
    // bit-for-bit; every rank ties to the lowest neighbor id.
    //
    // Scale shape: codes ride ONE equi-join on the cell id (the IVF
    // shortlist — candidates per query bounded by cell size × nProbe);
    // the probe side (20 queries × nProbe cells × 4 LUTs) is a bounded
    // broadcast spine; the exact leg is the x03 brute-force baseline,
    // present only because the query's OUTPUT is the recall audit — a
    // deployment serves the approx leg alone.
    // Index constants below are the FROZEN oracle settings; the plan
    // itself is parameterized in ext/AnnIndex (round-8 task #5 —
    // RoundTenSpec re-runs the same plan at other nProbe/kc/m values
    // and pins the recall@5 tuning curve).
    "x72_ivfpq_ann" -> ((s, dir) => {
      val base = spread(t(s, dir, "embeddings"))
        .select(col("vec_id"), toD(col("embedding")).as("v"))
        .localCheckpoint()
      val approx = graft.ext.AnnIndex.ivfPqTopK(
        base, m = 4, sub = 16, kc = 8, kq = 16,
        nProbe = 2, topK = 5, nQ = 20)
      val exact = graft.ext.AnnIndex.exactTopK(base, topK = 5, nQ = 20)
      approx.join(exact, Seq("query_id", "neighbor_id"), "left")
        .select(col("query_id"), col("rnk"), col("neighbor_id"),
          col("adc_d2"), coalesce(col("exact_hit"), lit(false)).as("exact_hit"))
        .orderBy(col("query_id"), col("rnk"))
    }),

    // Approximate k-NN GRAPH over the embedding corpus — every node's
    // top-k nearest neighbors, the substrate for graph-based curation
    // (SemDeDup-style clustering, kNN-LM retrieval sets, label
    // propagation over semantic neighborhoods). x03/x72 answer "top-k
    // for THESE 20 queries"; this op answers it for EVERY node at once,
    // which is exactly where brute force dies (n² distances) and the
    // cell-restricted form survives: candidates come only from the
    // node's own k-means cell, so the pairwise stage is O(n·cell) with
    // the cell population held bounded by growing k with the corpus
    // (the x58 adjudication, measured flat in ScaleProbe).
    //
    // Determinism: KMeansLite's bit-exact quantized fit (driver state
    // k·d doubles); distances are the zip_with left-fold both engines
    // reproduce bit-for-bit, compared in integer micro-units
    // (floor(d2·1e6 + 0.5) — pure IEEE arithmetic, no round() tie
    // hazard); ranks tie to the lowest neighbor id.
    //
    // Scale shape: ONE equi-join on the cell id (exchange reused for
    // both sides of the self-join) + a src-keyed rank window. Nothing
    // driver-side, nothing n². Recall tuning at scale = multi-probe
    // (assign each node to its p nearest cells as x72's probe leg
    // does) — same plan, p× candidate rows.
    // k=16/topK=5/nProbe=1 are the frozen oracle settings; the plan is
    // parameterized in ext/AnnIndex.knnGraph (nProbe is the recall
    // knob — RoundTenSpec pins the multi-probe tuning curve).
    "x73_knn_graph" -> ((s, dir) => {
      // checkpoint + corpus count in one job (round-17, GraftCheckpoint)
      val (corpus, nCorpus) = org.apache.spark.sql.GraftCheckpoint
        .checkpointWithCount(spread(t(s, dir, "embeddings"))
          .select(col("vec_id"), toD(col("embedding")).as("v")))
      // k∝corpus (round-11): the demo runs the deployment discipline
      graft.ext.AnnIndex.knnGraph(corpus, k = corpusK(nCorpus),
        topK = 5, nProbe = 1)
        .orderBy(col("src_id"), col("rnk"))
    }),

    // BPE-style corpus pair-merge rounds — the distributed core of
    // tokenizer TRAINING (Sennrich et al. 2016): repeatedly find the
    // most frequent adjacent token pair across the whole corpus and
    // fuse its occurrences into one symbol. Three rounds unrolled
    // (the x70 PageRank discipline: per-round dataflow, zero driver
    // state — the winning pair rides a 1-row broadcast, never a
    // collect).
    //
    // The merge machinery lives in ext/BpeMerge (round-8 task #6).
    // THIS entry runs the a ≠ b policy — what the DuckDB oracle
    // mirrors: with distinct halves an occurrence can never overlap
    // the next one (a match ending at i would need t[i]=a and t[i]=b
    // at once), so "merge all occurrences" is position-independent
    // and both engines rebuild token arrays with pure per-element
    // arithmetic. Identical-half (a, a) merges are BpeMerge's
    // allowIdentical=true policy — deterministic left-greedy within
    // runs, real BPE's rule — pinned by RoundTenSpec against
    // hand-computed run rewrites. Pairs are packed a + U+0001 + b
    // (U+0001 sorts below every token char, so packed-string order
    // IS (a, b) tuple order in both engines).
    //
    // Scale shape per round: one partial-aggregated shuffle on the
    // packed pair (counts), a 1-row TakeOrderedAndProject argmax
    // broadcast back (the x32 scalar shape — PlanAudit's adjudicated
    // BNLJ), and a NARROW per-document array rewrite. Rounds compose
    // linearly; a production vocab build runs the same plan to
    // convergence with per-round checkpointing like Components.
    "x74_bpe_merges" -> ((s, dir) => {
      val t0 = spread(t(s, dir, "documents"))
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
        .withColumn("n_before", size(col("toks")).cast("long"))
      val t3 = graft.ext.BpeMerge.mergeRounds(t0, 3)
      t3.select(col("doc_id"), col("n_before"),
        size(col("toks")).cast("long").as("n_after"),
        array_join(col("toks"), " ").as("text_merged"),
        col("merge_1"), col("merge_2"), col("merge_3"))
        .orderBy(col("doc_id"))
    }),

    // Incremental kNN-graph maintenance against a FROZEN index — the
    // x42 incremental pattern on x73's plan (round-8 verdict task #7).
    // Old corpus = vec_id % 10 != 0 (the persisted index: centroids
    // fit on it, assignments stored); new batch = vec_id % 10 == 0
    // arrives later, probes its frozen cells, and ONLY the
    // batch-touched cells recompute. Output = refreshed edges for
    // every node in a touched cell. The oracle runs the FULL
    // frozen-index recompute restricted to touched cells — proving
    // row-identity: incremental maintenance loses nothing, because a
    // node's candidates never leave its own cell.
    //
    // Scale shape: the touched-cell spine (≤ min(batch, k) rows)
    // BROADCASTS against the persisted assignments, so per-batch work
    // is O(touched-cell population), independent of corpus size; the
    // rank window is keyed on src_id. RoundTenSpec pins the same law
    // at the DataFrame level plus the untouched-cells-absent property.
    "x75_incremental_knn" -> ((s, dir) => {
      val corpus = spread(t(s, dir, "embeddings"))
        .select(col("vec_id"), toD(col("embedding")).as("v"))
        .localCheckpoint()
      val old = corpus.filter(col("vec_id") % 10 =!= 0)
      // k∝corpus (round-11): cells derive from the OLD corpus — the
      // side the frozen index was fit on, matching the oracle's
      // fitWhere-filtered count
      graft.ext.AnnIndex.incrementalNeighbors(
        old, corpus.filter(col("vec_id") % 10 === 0),
        k = corpusK(old.count()), topK = 5)
        .orderBy(col("src_id"), col("rnk"))
    }),

    // Bloom-filter decontamination (ext/Bloom): membership of every
    // document's 5-grams against a reference blocklist (docs with
    // doc_id % 10 == 0) folded into a 2^16-slot, 4-hash Bloom filter.
    // This is the shape that beats x24's vocabulary equi-join at
    // scale: the reference side reduces to ≤ 65536 set-bit positions
    // (broadcast) no matter how many billions of grams it holds, and
    // the test side never shuffles on the gram — only the per-doc
    // aggregation shuffles, keyed on doc_id. The demo ALSO runs the
    // exact vocabulary join to surface false positives per document
    // (n_fp = bloom hits − exact hits); a production decontamination
    // pass drops that audit join — it exists here to make the FP
    // behavior itself oracle-checked.
    "x76_bloom_decontaminate" -> ((s, dir) => {
      val j = 4
      val grams = spread(t(s, dir, "documents"))
        .withColumn("tk", Text.tokens(col("text")))
        .filter(size(col("tk")) >= 5)
        .select(col("doc_id"), explode(Text.wordShingles(col("tk"), 5)).as("gram"))
      val refVocab = grams.filter(col("doc_id") % 10 === 0)
        .select(col("gram")).distinct()
      val bits = Bloom.build(refVocab, col("gram"), j)
      Bloom.test(grams, col("gram"), bits, j)
        .join(refVocab.withColumn("in_ref", lit(1L)), Seq("gram"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("bloom_hit"), lit(1L)).otherwise(lit(0L))).as("n_bloom"),
          sum(coalesce(col("in_ref"), lit(0L))).as("n_exact"))
        .withColumn("n_fp", col("n_bloom") - col("n_exact"))
        .withColumn("bloom_ratio", round(
          col("n_bloom").cast("double") / col("n_grams").cast("double"), 4))
        .withColumn("flagged", col("bloom_ratio") >= 0.5)
        .orderBy(col("doc_id"))
    }),

    // HLL distinct-count sketch (ext/Hll): per-language distinct-
    // trigram cardinality from 64 five-bit registers — the constant-
    // space sibling of x27's KMV, rebuilt md5-deterministic so the
    // oracle validates every register sum and the final estimate
    // bit-for-bit (Spark's own approx_count_distinct HLL++ can't sit
    // under a hash oracle). The partial aggregate reduces each
    // partition to ≤ 64 (lang, register) rows before the shuffle —
    // sketch-sized traffic at any corpus size — while the exact
    // countDistinct beside it (the accuracy audit) pays the full
    // distinct-gram shuffle the sketch exists to avoid.
    "x77_hll_distinct" -> ((s, dir) => {
      val grams = spread(t(s, dir, "documents"))
        .withColumn("tk", Text.tokens(col("text")))
        .filter(size(col("tk")) >= 3)
        .select(col("lang"), explode(Text.wordShingles(col("tk"))).as("gram"))
      val regs = grams
        .withColumn("h", Hll.h32(col("gram")))
        .select(col("lang"), Hll.regIndex(col("h")).as("idx"),
          Hll.rho(col("h")).as("rho"))
        .groupBy(col("lang"), col("idx"))
        .agg(max(col("rho")).as("m_rho"))
      val sketch = regs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_regs"),
          sum(Hll.presentWeight("m_rho")).as("s_present"))
        .withColumn("v_zero", lit(Hll.M.toLong) - col("n_regs"))
        .withColumn("s_int",
          col("s_present") + col("v_zero") * lit(Hll.EmptyWeight))
      val exact = grams.groupBy(col("lang"))
        .agg(countDistinct(col("gram")).as("exact_distinct"))
      exact.join(sketch, Seq("lang"))
        .select(col("lang"), col("exact_distinct"), col("v_zero"),
          col("s_int"),
          Hll.estimate(col("s_int"), col("v_zero")).as("hll_estimate"))
        .withColumn("rel_err", round(
          (col("hll_estimate") - col("exact_distinct").cast("double")) /
            col("exact_distinct").cast("double"), 4))
        .orderBy(col("lang"))
    }),

    // PMI collocations: top-20 adjacent-bigram associations with a
    // min-count prune (c_ab ≥ 5) BEFORE the unigram joins — the prune
    // is what makes collocation mining scale: the bigram→unigram join
    // ships only surviving collocations (broadcast) against the
    // unigram vocabulary, never the corpus-sized bigram stream. The
    // PMI ratio is computed as ONE division of two exact integer
    // products (long→double casts and the division are correctly
    // rounded, so cross-engine identical; at corpora where
    // c_ab·N_uni² would exceed a long, switch to the log-sum form and
    // widen the rounding), then ln, quantized to 6 decimals before
    // ranking (the x20 pattern). rank ≤ 20 over the pruned set is the
    // x40 TakeOrderedAndProject shape — the global window never sees
    // more than the pruned collocation table.
    //
    // Round-11: the token arrays are localCheckpoint'd so the regex
    // tokenize pass runs ONCE — the unigram and bigram aggregates
    // previously each re-tokenized the corpus from the scan; so is the
    // unigram vocabulary (read three times: n_uni and both sides of
    // the collocation join). The long-product overflow the round-10
    // advice flagged now fails LOUDLY via assert_true instead of
    // silently wrapping: c_ab·n_uni² ≤ Long.Max is checked as
    // c_ab ≤ (Max div n_uni) div n_uni (sequential integer divides —
    // themselves overflow-free), same for the n_bi·c_a·c_b
    // denominator. DuckDB raises on overflow, so the engines now agree
    // at every corpus size: either both compute, or both refuse.
    "x78_pmi_collocations" -> ((s, dir) => {
      val toks = spread(t(s, dir, "documents"))
        .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
        .localCheckpoint()
      val uni = toks.select(explode(col("tk")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c_w"))
        .localCheckpoint()
      val nUni = uni.agg(sum(col("c_w")).as("n_uni"))
      val bi = toks.filter(size(col("tk")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(tk) - 1),
            |  i -> named_struct('a', element_at(tk, i),
            |                    'b', element_at(tk, i + 1)))""".stripMargin))
          .as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      val nBi = bi.agg(sum(col("c_ab")).as("n_bi"))
      val maxL = lit(Long.MaxValue)
      val scored = broadcast(bi.filter(col("c_ab") >= 5))
        .join(uni.select(col("w").as("a"), col("c_w").as("c_a")), "a")
        .join(uni.select(col("w").as("b"), col("c_w").as("c_b")), "b")
        .crossJoin(broadcast(nUni))
        .crossJoin(broadcast(nBi))
        .filter(coalesce(assert_true(
          col("c_ab") <= maxL / col("n_uni") / col("n_uni") &&
            col("c_b") <= maxL / col("n_bi") / col("c_a"),
          lit("x78: PMI integer product would overflow long — " +
            "switch to the log-sum form at this corpus size")),
          lit(true)))
        .withColumn("pmi6", round(log(
          (col("c_ab") * col("n_uni") * col("n_uni")).cast("double") /
            (col("n_bi") * col("c_a") * col("c_b")).cast("double")), 6))
      val w = Window.orderBy(col("pmi6").desc, col("a"), col("b"))
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 20)
        .select(col("rnk"), col("a"), col("b"), col("c_ab"),
          col("c_a"), col("c_b"), col("pmi6"))
        .orderBy(col("rnk"))
    }),

    // Conjunctive boolean retrieval over an inverted index: the query
    // is the 3 highest-document-frequency terms (deterministic, data-
    // derived); a document matches iff it contains ALL three, ranked
    // by summed term frequency. The posting list join is keyed on the
    // term with the 3-row term set BROADCAST, so only matching
    // postings shuffle (keyed doc_id for the intersection count) —
    // the smallest-posting-first discipline of a search engine,
    // expressed as count(distinct term) == |query|. Both global
    // windows (top-3 terms, top-20 docs) are bounded-rank
    // TakeOrderedAndProject shapes.
    // Round-11: the postings table is localCheckpoint'd — it feeds
    // both the document-frequency ranking and the final intersection,
    // and without the checkpoint each consumer re-ran the corpus
    // explode+aggregate. The conjunction count is a plain count(*):
    // postings are distinct on (doc_id, w) BY CONSTRUCTION (they are
    // the groupBy keys), so count(DISTINCT w) only added an Expand +
    // second aggregate exchange for a value already guaranteed.
    "x79_boolean_retrieval" -> ((s, dir) => {
      val postings = spread(t(s, dir, "documents"))
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val dfTbl = postings.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val wTop = Window.orderBy(col("df").desc, col("w"))
      val terms = dfTbl.withColumn("trnk", row_number().over(wTop))
        .filter(col("trnk") <= 3)
      val wRank = Window.orderBy(col("total_tf").desc, col("doc_id"))
      postings.join(broadcast(terms.select(col("w"))), "w")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_terms"),
          sum(col("tf")).as("total_tf"))
        .filter(col("n_terms") === 3)
        .withColumn("rnk", row_number().over(wRank).cast("long"))
        .filter(col("rnk") <= 20)
        .select(col("rnk"), col("doc_id"), col("total_tf"))
        .orderBy(col("rnk"))
    }),

    // Label propagation over the kNN structure (semi-supervised
    // labeling — how a small set of human/classifier quality labels
    // spreads to a whole corpus): nodes with vec_id % 5 == 0 are
    // "unlabeled"; each takes the MAJORITY label of its 5 nearest
    // LABELED neighbors within its k-means cell (x73's candidate
    // discipline — one cell equi-join, never n²), ties to the lowest
    // label, distances in integer micro-units. The output carries the
    // held-out true label so the query IS its own accuracy audit.
    // Scale: k∝corpus (round-16 — this site still passed a literal 16
    // while its comment claimed the x73 discipline; the r16 sized-heap
    // cohort caught it: the masked×voters equi-join on a FIXED cell
    // count carries n²/16 candidate mass — the x10 quadratic class.
    // corpusK holds cell population ~500, so candidates are O(n·500));
    // both windows are keyed by src_id.
    "x80_label_propagation" -> ((s, dir) => {
      // checkpoint + corpus count in one job (round-17, GraftCheckpoint)
      val (base, nBase) = org.apache.spark.sql.GraftCheckpoint
        .checkpointWithCount(spread(t(s, dir, "embeddings"))
          .select(col("vec_id"), toD(col("embedding")).as("v"), col("label")))
      val cents = KMeansLite.fitQuantized(base, "vec_id", "v",
        corpusK(nBase), iters = 1)
      val assigned = base.withColumn("cell", KMeansLite.assign(col("v"), cents))
      val masked = assigned.filter(col("vec_id") % 5 === 0)
        .select(col("cell"), col("vec_id").as("src_id"),
          col("v").as("va"), col("label").as("true_label"))
      val voters = assigned.filter(col("vec_id") % 5 =!= 0)
        .select(col("cell"), col("vec_id").as("neighbor_id"),
          col("v").as("vb"), col("label").as("voter_label"))
      val wSrc = Window.partitionBy(col("src_id"))
        .orderBy(col("d2_e6"), col("neighbor_id"))
      val wVote = Window.partitionBy(col("src_id"))
        .orderBy(col("n_votes").desc, col("voter_label"))
      masked.join(voters, "cell")
        .withColumn("d2_e6",
          floor(KMeansLite.dist2(col("va"), col("vb")) * 1e6 + 0.5))
        .withColumn("rnk", row_number().over(wSrc))
        .filter(col("rnk") <= 5)
        .groupBy(col("src_id"), col("true_label"), col("voter_label"))
        .agg(count(lit(1)).as("n_votes"))
        .withColumn("vr", row_number().over(wVote))
        .filter(col("vr") === 1)
        .select(col("src_id"), col("true_label"),
          col("voter_label").as("predicted_label"), col("n_votes"),
          (col("voter_label") === col("true_label")).as("correct"))
        .orderBy(col("src_id"))
    }),

    // Weighted reservoir sampling without replacement (Efraimidis–
    // Spirakis A-ES, Sampling.esKey): top-10 docs per source ranked by
    // the deterministic md5-derived key ln(u)/n_chars — longer docs
    // proportionally likelier, membership a pure function of the data
    // (re-runs, re-shards, and the oracle agree row-for-row, unlike
    // rand()-based sampling). One narrow map + a per-source rank
    // window; no global state at any corpus size.
    "x81_weighted_sample" -> ((s, dir) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("key12").desc, col("doc_id"))
      t(s, dir, "documents").filter(col("n_chars") > 0)
        .withColumn("key12", Sampling.esKey(col("doc_id"), col("n_chars")))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 10)
        .select(col("source"), col("rnk"), col("doc_id"), col("n_chars"),
          col("key12"))
        .orderBy(col("source"), col("rnk"))
    }),

    // Top principal direction of the embedding corpus by deterministic
    // power iteration (ext/PowerIter — the KMeansLite integer-sum
    // discipline applied to a distributed matrix multiply), then every
    // vector scored against it: projection and residual energy. The
    // extreme |projection| tail is the "dominant-direction" diagnostic
    // of embedding-corpus health (anisotropy / cone collapse —
    // Ethayarajh 2019 — and boilerplate floods show up here before
    // they show up in token stats). The oracle recomputes BOTH
    // unrolled iterations in SQL — exact integer register sums, the
    // same 64-term norm fold — so the learned DIRECTION itself is
    // verified bit-for-bit, not just the scores. rank ≤ 20 is the x40
    // bounded TakeOrderedAndProject shape.
    "x82_power_iteration" -> ((s, dir) => {
      val base = spread(t(s, dir, "embeddings"))
        .select(col("vec_id"), toD(col("embedding")).as("v"))
        .localCheckpoint()
      val pc1 = typedlit(graft.ext.PowerIter.fit(base, "v", dims = 64, iters = 2))
      val w = Window.orderBy(col("abs_proj").desc, col("vec_id"))
      base
        .withColumn("proj6", round(Similarity.dot(col("v"), pc1), 6))
        .withColumn("abs_proj", abs(col("proj6")))
        .withColumn("resid6",
          round(Similarity.norm2(col("v")) - col("proj6") * col("proj6"), 6))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 20)
        .select(col("rnk"), col("vec_id"), col("proj6"), col("resid6"))
        .orderBy(col("rnk"))
    }),

    // The capstone composition: the full pretraining-data gate as ONE
    // dataflow — quality rules (x71) → exact dedup (x01) →
    // Bloom decontamination (x76) → A-ES weighted sampling (x81) →
    // context packing (x19) — with a per-document disposition naming
    // the FIRST stage that dropped it. Corpus = documents ∪ identical
    // copies so dedup does real work; eval blocklist = base docs with
    // doc_id % 17 == 0. The stages thread through one frame with
    // CONDITIONAL window partitions (rank within (q_pass, md5), rank
    // within (eligible, source), cumsum within (kept, source, lang))
    // instead of per-stage self-joins — so the whole gate costs: one
    // gram aggregation + doc-keyed join (contam grain), three keyed
    // window shuffles, zero corpus self-joins. Every stage's math is
    // the already-oracle-proven form, so the composition's oracle is
    // assembled from the same SQL pieces.
    "x83_pipeline_gate" -> ((s, dir) => {
      val base = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
      val corpus = spread(base.unionByName(
        base.withColumn("doc_id", col("doc_id") + 10000)))
      // stage 1: quality (the x71 integer rules)
      val q = corpus
        .withColumn("tk", Text.tokens(col("text")))
        .withColumn("n_words", size(col("tk")).cast("long"))
        .withColumn("mwl100",
          expr("(CAST(length(regexp_replace(text, '\\\\s', '')) AS BIGINT)" +
            " * 100) div n_words"))
        .withColumn("stop_count", Text.stopwordCount(col("tk")))
        .withColumn("sym_ppm",
          expr("(CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', ''))" +
            " AS BIGINT) * 1000000)" +
            " div greatest(CAST(length(text) AS BIGINT), 1)"))
        .withColumn("q_pass",
          col("n_words").between(50, 100000)
            && col("mwl100").between(300, 1000)
            && col("stop_count") >= 2
            && col("sym_ppm") <= 100000)
      // stage 2: exact dedup among quality passers — rank within the
      // (q_pass, content hash) partition, no self-join
      val wDup = Window.partitionBy(col("q_pass"), col("content_md5"))
        .orderBy(col("doc_id"))
      val d = q.withColumn("content_md5", md5(col("text")))
        .withColumn("dup_rank", row_number().over(wDup))
      // stage 3: Bloom decontamination of dedup survivors vs the eval
      // blocklist (x76's filter; quality already guarantees >= 50
      // tokens, so every survivor has 5-grams)
      val evalGrams = base.filter(col("doc_id") % 17 === 0)
        .withColumn("tk", Text.tokens(col("text")))
        .filter(size(col("tk")) >= 5)
        .select(explode(Text.wordShingles(col("tk"), 5)).as("gram"))
        .distinct()
      val bits = Bloom.build(evalGrams, col("gram"), j = 4)
      val ratios = Bloom.test(
        d.filter(col("q_pass") && col("dup_rank") === 1)
          .select(col("doc_id"),
            explode(Text.wordShingles(col("tk"), 5)).as("gram")),
        col("gram"), bits, j = 4)
        .groupBy(col("doc_id"))
        .agg(round(
          sum(when(col("bloom_hit"), lit(1L)).otherwise(lit(0L)))
            .cast("double") / count(lit(1)).cast("double"), 4)
          .as("contam_ratio"))
      val e = d.join(ratios, Seq("doc_id"), "left")
        .withColumn("contam",
          coalesce(col("contam_ratio"), lit(0.0)) >= 0.5)
        .withColumn("eligible",
          col("q_pass") && col("dup_rank") === 1 && !col("contam"))
      // stage 4: A-ES weighted sample, top-10 per source among the
      // eligible — rank within the (eligible, source) partition
      val wS = Window.partitionBy(col("eligible"), col("source"))
        .orderBy(col("key12").desc, col("doc_id"))
      val sampled = e
        .withColumn("key12", Sampling.esKey(col("doc_id"),
          greatest(col("n_chars"), lit(1L))))
        .withColumn("s_rank", row_number().over(wS))
        .withColumn("kept", col("eligible") && col("s_rank") <= 10)
      // stage 5: context packing of the kept set — cumsum within the
      // (kept, source, lang) partition, nulled out for dropped docs
      Pack.contextSpans(sampled, col("n_words"), col("doc_id"), 512,
        col("kept"), col("source"), col("lang"))
        .withColumn("stage",
          when(!col("q_pass"), "quality")
            .when(col("dup_rank") > 1, "dup")
            .when(col("contam"), "contam")
            .when(col("s_rank") > 10, "sample")
            .otherwise("kept"))
        .select(col("doc_id"), col("stage"),
          when(col("kept"), col("n_tokens")).as("n_tokens"),
          when(col("kept"), col("tok_offset")).as("tok_offset"),
          when(col("kept"), col("first_chunk")).as("first_chunk"),
          when(col("kept"), col("n_chunks")).as("n_chunks"))
        .orderBy(col("doc_id"))
    }),

    // Containment join — the ASYMMETRIC set-similarity x12's resemblance
    // can't express: |tri(q) ∩ tri(d)| / |tri(q)| ≥ 0.9 finds a QUOTE
    // inside a larger source even when the source is 10× longer (its
    // Jaccard would be ~0.1 and every resemblance threshold misses it).
    // This is the quote/excerpt-detection pass of a pretraining
    // pipeline. Corpus of quotes = first 30 tokens of even docs
    // (id+20000). Candidate generation is an equi-join on the quote's
    // OPENING trigram against the corpus's distinct-trigram postings —
    // one blocking key per quote (not |tri(q)| keys), corpus-linear
    // postings on the other side, so the join output is "docs that
    // contain the quote's first trigram", a selective set; exact
    // containment then runs only on candidates via array_intersect of
    // the two bounded distinct-trigram arrays. No all-pairs anywhere.
    "x84_containment_join" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
        .withColumn("tk", Text.tokens(col("text")))
        .filter(size(col("tk")) >= 3)
        .select(col("doc_id"), Text.wordShingles(col("tk")).as("tri"))
      val quotes = spread(t(s, dir, "documents"))
        .withColumn("tk", Text.tokens(col("text")))
        .filter(col("doc_id") % 2 === 0 && size(col("tk")) >= 30)
        .select((col("doc_id") + 20000).as("quote_id"),
          Text.wordShingles(expr("slice(tk, 1, 30)")).as("qtri"),
          concat_ws(" ", element_at(col("tk"), 1), element_at(col("tk"), 2),
            element_at(col("tk"), 3)).as("block"))
      val postings = docs.select(col("doc_id"),
        explode(col("tri")).as("block"))
      quotes.join(postings, "block")
        .join(docs, "doc_id")
        .withColumn("n_q", size(col("qtri")).cast("long"))
        .withColumn("n_common",
          graft.ext.Dedup.intersectSize(col("qtri"), col("tri")))
        .withColumn("containment",
          round(col("n_common").cast("double") / col("n_q").cast("double"), 4))
        .filter(col("containment") >= 0.9)
        .select(col("quote_id"), col("doc_id"), col("n_q"), col("n_common"),
          col("containment"))
        .orderBy(col("quote_id"), col("doc_id"))
    }),

    // Deterministic training-shard write-out (r10 verdict, missing
    // #2): the step AFTER selection/packing — a seeded global shuffle
    // of the kept set (here: dedup survivors with n_chars ≥ 200, the
    // x01 window discipline) and fixed-size shard assignment, every
    // (doc → shard, position) a pure function of (data, seed).
    // ext/Shards computes the md5-order global rank WITHOUT a
    // single-partition sort: 256 key-prefix buckets rank in parallel,
    // offsets ride a 256-row cumsum (the adjudicated bounded window).
    // Shards.write lands it partitionBy(shard); appends go to fresh
    // shards via rankOffset while shipped (shard, position) pairs
    // stay immutable — RoundElevenSpec pins determinism, dense
    // fixed-size shards, and append stability.
    "x86_shard_writeout" -> ((s, dir) => {
      val wD = Window.partitionBy(col("h")).orderBy(col("doc_id"))
      val kept = spread(t(s, dir, "documents"))
        .filter(col("n_chars") >= 200)
        .withColumn("h", md5(col("text")))
        .withColumn("dr", row_number().over(wD))
        .filter(col("dr") === 1)
        .select(col("doc_id"))
      graft.ext.Shards.assign(kept, col("doc_id"),
        docsPerShard = 100, seed = 42)
        .select(col("doc_id"), col("skey"), col("shard"), col("position"))
        .orderBy(col("doc_id"))
    }),

    // x72 WITHOUT the exact-recall audit leg — the DEPLOYMENT form of
    // IVF+PQ ANN search (r10 verdict, missing #3): identical index
    // build and ADC probe, but the brute-force exact top-k join that
    // made x72's output a recall audit is gone, so this query's cost
    // IS what serving pays. Same oracle machinery (ivfPqSql with
    // audit=false) — the approx results themselves stay hash-checked.
    // PLANS.md round-11 prices both forms at sf1 side by side.
    "x87_ivfpq_serve" -> ((s, dir) => {
      val base = spread(t(s, dir, "embeddings"))
        .select(col("vec_id"), toD(col("embedding")).as("v"))
        .localCheckpoint()
      graft.ext.AnnIndex.ivfPqTopK(
        base, m = 4, sub = 16, kc = 8, kq = 16,
        nProbe = 2, topK = 5, nQ = 20)
        .select(col("query_id"), col("rnk"), col("neighbor_id"),
          col("adc_d2"))
        .orderBy(col("query_id"), col("rnk"))
    }),

    // x76 WITHOUT the exact-membership audit join — the DEPLOYMENT
    // form of Bloom decontamination (r10 verdict, missing #3): build
    // the ≤ 2^16-position filter from the reference, probe every
    // document's 5-grams, flag by hit ratio. The exact vocabulary
    // join that priced x76's false positives is gone — production
    // accepts the FP rate it audited once. Only the per-doc
    // aggregation shuffles, keyed on doc_id.
    "x88_bloom_serve" -> ((s, dir) => {
      val j = 4
      val grams = spread(t(s, dir, "documents"))
        .withColumn("tk", Text.tokens(col("text")))
        .filter(size(col("tk")) >= 5)
        .select(col("doc_id"),
          explode(Text.wordShingles(col("tk"), 5)).as("gram"))
      val refVocab = grams.filter(col("doc_id") % 10 === 0)
        .select(col("gram")).distinct()
      val bits = Bloom.build(refVocab, col("gram"), j)
      Bloom.test(grams, col("gram"), bits, j)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("bloom_hit"), lit(1L)).otherwise(lit(0L)))
            .as("n_bloom"))
        .withColumn("bloom_ratio", round(
          col("n_bloom").cast("double") / col("n_grams").cast("double"), 4))
        .withColumn("flagged", col("bloom_ratio") >= 0.5)
        .orderBy(col("doc_id"))
    }),

    // Histogram quantile sketch (ext/Quantiles) — the rank/quantile
    // member of the sketch suite (x37 KMV = distinct, x40 CMS =
    // frequency, x77 HLL = constant-space distinct): "what document
    // length sits at quantile q" WITHOUT a corpus-sized sort. State is
    // one count per occupied fixed-width bin (domain-bounded,
    // mergeable by addition — StreamQuantile is the streaming twin);
    // the read-off picks the first bin whose cumulative count reaches
    // t = ceil(q·N) and reports its upper edge — exact in RANK,
    // bounded in VALUE (est − exact < binWidth, proven in
    // RoundElevenSpec and visible here: the exact leg is the SAME
    // read-off at binWidth 1, so the err column the oracle checks IS
    // the bound). Quantile targets travel as exact ppm integers, so
    // both engines compute identical ranks with zero float hazard.
    "x89_quantile_histogram" -> ((s, dir) => {
      import graft.ext.Quantiles
      val qPpm = Seq(250000L, 500000L, 750000L, 900000L, 990000L)
      val docs = t(s, dir, "documents")
      val sk = Quantiles.quantiles(
        Quantiles.histogram(docs, col("n_chars"), 64L), 64L, qPpm)
      val ex = Quantiles.quantiles(
        Quantiles.histogram(docs, col("n_chars"), 1L), 1L, qPpm)
        .select(col("q_ppm"), col("est").as("exact"))
      sk.join(ex, "q_ppm")
        .select(col("q_ppm"), col("n_total"), col("t"), col("est"),
          col("exact"), (col("est") - col("exact")).as("err"))
        .orderBy(col("q_ppm"))
    }),

    // Content-defined chunking (ext/Cdc) — the dedup grain x31's
    // fixed-stride chunker can't provide: Rabin-style rolling-hash
    // boundaries are a pure function of LOCAL content, so an inserted
    // preamble shifts only the chunks up to the first post-edit
    // boundary and every later chunk hash SURVIVES (the planted
    // corpus here: even docs re-appear under id+30000 with an
    // 18-char preamble — their tails dedup against the originals,
    // which is exactly what fixed-stride chunking loses). Chunking is
    // one narrow map (per-doc integer polynomial hashes, both engines
    // bit-identical mod 1e9+7); only the 32-byte chunk-hash aggregate
    // shuffles. n_shared_chunks counts a doc's chunks that appear in
    // ≥2 distinct docs — the dedupable mass CDC exposes.
    "x90_cdc_chunks" -> ((s, dir) => {
      import graft.ext.ContentChunks
      val docs = t(s, dir, "documents")
      val corpus = docs.select(col("doc_id"), col("text")).unionByName(
        docs.filter(col("doc_id") % 2 === 0)
          .select((col("doc_id") + 30000).as("doc_id"),
            concat(lit("INSERTED PREAMBLE "), col("text")).as("text")))
      val ch = spread(corpus)
        .select(col("doc_id"),
          explode(ContentChunks.chunks(col("text"), 8)).as("chunk"))
        .select(col("doc_id"), md5(col("chunk")).as("h"))
        .localCheckpoint() // feeds the per-doc count AND the share join
      val perH = ch.groupBy(col("h"), col("doc_id"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("h")).agg(count(lit(1)).as("nd"))
      ch.join(perH, "h")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared_chunks"))
        .orderBy(col("doc_id"))
    }),

    // Distributed AUC (ext/Auc) — classifier evaluation as a first-
    // class pipeline op: every quality / contamination / language
    // classifier a curation stack trains needs its ROC area computed
    // over millions of held-out rows, and the naive rank formula is a
    // corpus-sized sort. Here: Mann–Whitney in integer doubled units
    // over the distinct-score histogram, cumulative negatives via the
    // x86 two-level bucketed rank (≤ 257-row global window). Demo
    // task: score = squared-norm of the embedding in micro-units,
    // positive = even label — a weak but nonzero signal, so the demo
    // exercises ties, both classes, and a mid-range AUC; the operator
    // takes ANY (score, label) pair.
    "x91_auc" -> ((s, dir) => {
      val base = t(s, dir, "embeddings")
        .select(
          floor(Similarity.norm2(toD(col("embedding"))) * 1e6 + 0.5)
            .cast("long").as("s"),
          (col("label") % 2 === 0).as("pos"))
      graft.ext.Auc.auc(base, col("s"), col("pos"))
    }),

    // BPE ENCODE, SERVE FORM (r11 verdict task 1a — the x87/x88
    // serve-twin discipline applied to the toy-depth train+encode
    // demo that used to be registered as x85; x85 retired to
    // spec-only in r14, with registered train+encode coverage now
    // held by x124): a combined train-and-encode entry carries
    // training's sequential fixed latency (argmax jobs + corpus
    // checkpoints) that a deployed tokenizer pays ONCE per
    // vocabulary, not per corpus.
    // Here the rule table is built by BpeMerge.topPairs — ONE
    // aggregate pass over the 10% sample producing the ranked merge
    // table a deployment would load from disk — checkpointed (the
    // "persisted table" materialization, a 3-row frame), then the
    // encode hot path applies the rules in rank order corpus-wide:
    // k 1-row broadcasts + narrow per-document rewrites, no shuffle,
    // no state, corpus-linear. This entry's cost IS what per-corpus
    // tokenization pays. The oracle recomputes the identical rule
    // table and rewrites, md5-verifying every document's full token
    // stream.
    "x92_bpe_encode_serve" -> ((s, dir) => {
      import graft.ext.BpeMerge
      val docs = spread(t(s, dir, "documents"))
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      val rules = BpeMerge.topPairs(
        docs.filter(col("doc_id") % 10 === 0), k = 3).localCheckpoint()
      val pairs = (1 to 3).map(i =>
        rules.filter(col("r") === i).select(col("ma"), col("mb")))
      BpeMerge.encode(docs, pairs)
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          md5(array_join(col("toks"), " ")).as("tokens_md5"))
        // narrow from the scan — materialize the 3-column fingerprints
        // before the output sort's range sampler (the x85 finding)
        .localCheckpoint()
        .orderBy(col("doc_id"))
    }),

    // BM25 ranked retrieval (Robertson/Sparck Jones weighting in the
    // Lucene "+1" idf form; k1 = 1.2, b = 0.75) — the scored member of
    // the retrieval family (x79 = conjunctive boolean, x20 = TF-IDF
    // top terms): rank every document against the corpus's top-5-df
    // query term set. Scoring is engineered for cross-engine
    // bit-identity: idf = round(ln((N−df+0.5)/(df+0.5)+1), 6) — the
    // one libm call, quantized BEFORE use (the x32 discipline); the
    // tf/length part is an EXACT INTEGER rational — with k1 = 6/5,
    // b = 3/4: tf·(k1+1)/(tf + k1·(1−b+b·dl·N/T)) ==
    // 44·tf·T / (20·tf·T + 6·T + 18·dl·N) — so the only doubles are
    // one IEEE division of exact int64s and the idf product; per-term
    // scores land as integer micro-units and SUM ASSOCIATIVELY.
    // (int64 headroom: 44·tf·T needs tf·T < 2^57 — at 100 TB split
    // the corpus or drop to the log-sum form, the x78 note.)
    // Scale shape: postings/df/doclen are keyed aggregates; the query
    // term set is a 5-row broadcast; scoring is one doc-keyed join +
    // narrow arithmetic; rank ≤ 20 hits LimitPushDownThroughWindow
    // (the x40/x79 TakeOrderedAndProject shape, adjudicated).
    "x94_bm25" -> ((s, dir) => {
      val postings = spread(t(s, dir, "documents"))
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
        .localCheckpoint() // read 3×: df table, doc lengths, scoring
      val doclen = postings.groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("dl"))
      val totals = doclen.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("total_dl"))
      val dfTbl = postings.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val wTop = Window.orderBy(col("df").desc, col("w"))
      val qterms = dfTbl.withColumn("trnk", row_number().over(wTop))
        .filter(col("trnk") <= 5)
        .select(col("w"), col("df"))
      val wRank = Window.orderBy(col("score_e6").desc, col("doc_id"))
      postings.join(broadcast(qterms), "w")
        .join(doclen, "doc_id")
        .crossJoin(broadcast(totals))
        .withColumn("idf6", round(
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)
            + 1.0), 6))
        .withColumn("num", col("tf") * 44L * col("total_dl"))
        .withColumn("den", col("tf") * 20L * col("total_dl")
          + col("total_dl") * 6L + col("dl") * 18L * col("n_docs"))
        .withColumn("sc_e6", floor(col("idf6")
          * (col("num").cast("double") / col("den").cast("double"))
          * 1e6 + 0.5).cast("long"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_terms"), sum(col("sc_e6")).as("score_e6"))
        .withColumn("rnk", row_number().over(wRank).cast("long"))
        .filter(col("rnk") <= 20)
        .select(col("rnk"), col("doc_id"), col("n_terms"), col("score_e6"))
        .orderBy(col("rnk"))
    }),

    // Length-bucketed batch packing — the training-efficiency step
    // BEFORE the shard write: fixed-size batches pad every sequence
    // to the batch max, so batching in random order wastes
    // (max − len) tokens per row, while batching WITHIN 64-token
    // length buckets keeps batch members near-equal length (the
    // standard padding-waste reduction in LLM training loaders). The
    // query prices both strategies on the same corpus with the same
    // seeded order — n_batches, real vs padded token totals, waste in
    // exact ppm — so the output IS the packing audit. Determinism:
    // the "random" order is the x86 seeded md5 rank (no rand()); all
    // arithmetic integer. Scale shape: the naive leg rides
    // Shards.assign's two-level rank (256-row bounded global window,
    // adjudicated); the bucketed leg needs NO global rank at all —
    // batches never cross a length bucket, so a keyed per-bucket
    // window suffices (and that is exactly why loaders bucket).
    "x95_length_bucket_pack" -> ((s, dir) => {
      val B = 32
      val docs = spread(t(s, dir, "documents"))
        .select(col("doc_id"),
          size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
        .localCheckpoint() // shared by both strategy legs
      val naive = graft.ext.Shards.assign(
        docs, col("doc_id"), docsPerShard = B, seed = 42)
        .select(col("doc_id"), col("n_tokens"), col("shard").as("batch"))
      val wB = Window.partitionBy(col("lb"))
        .orderBy(col("skey"), col("doc_id"))
      val bucketed = docs
        .withColumn("lb", expr("n_tokens div 64"))
        .withColumn("skey", graft.ext.Shards.shuffleKey(col("doc_id"), 42))
        .withColumn("rn", row_number().over(wB).cast("long"))
        .withColumn("batch", expr(s"lb * 1000000 + (rn - 1) div $B"))
        .select(col("doc_id"), col("n_tokens"), col("batch"))
      def priced(df: DataFrame, strategy: String) = df
        .groupBy(col("batch"))
        .agg(count(lit(1)).as("n"), max(col("n_tokens")).as("mx"),
          sum(col("n_tokens")).as("rl"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("rl")).as("real_tokens"),
          sum(col("mx") * col("n")).as("padded_tokens"))
        .select(lit(strategy).as("strategy"), col("n_batches"),
          col("real_tokens"), col("padded_tokens"),
          expr("(padded_tokens - real_tokens) * 1000000 div padded_tokens")
            .as("waste_ppm"))
      priced(naive, "seeded_order")
        .unionByName(priced(bucketed, "length_bucketed"))
        .orderBy(col("strategy"))
    }),

    // HYBRID RETRIEVAL — BM25 (sparse) + exact cosine (dense) fused
    // with Reciprocal Rank Fusion (Cormack/Clarke/Buettcher 2009):
    // the serving shape every retrieval deployment actually runs —
    // two independent rankers, one rank-based fusion that needs no
    // score calibration. Queries = the first 8 corpus docs (their own
    // tokens as the sparse query, their own embedding as the dense
    // query). Determinism: BM25 per-term scores in the x94 integer
    // micro-unit recipe (idf round(·,6) before use, exact int64
    // rational, per-term floor), cosine in the x03 floor(·1e6+0.5)
    // units, and RRF itself in exact integer units — 10^9 div
    // (60 + rank), integer division in BOTH engines, so the fused
    // ordering never touches a float. Scale shape: corpus-side work
    // is three keyed postings aggregates (shared with x94's plan) +
    // one 8-row broadcast term set + an 8-row broadcast dense scan;
    // per-query candidate lists are truncated to 50 BEFORE the
    // fusion join, so the fuse is Q×50-bounded however big the
    // corpus. At production query counts the dense leg rides the
    // x87 IVF serve join instead of the brute scan — same fusion.
    "x97_hybrid_rrf" -> ((s, dir) => {
      // NO spread() and NO corpus-wide (doc_id, w) postings aggregate:
      // doc length is size(tokens) — a narrow map off the tokenized
      // checkpoint — and only the ≤40 query terms ever need tf/df, so
      // the one corpus-shaped shuffle is explode → broadcast-join on
      // the term set → a MATCHED-ROWS-ONLY aggregate, never a
      // vocabulary-wide one. Measured par with the x94-shaped
      // postings-checkpoint form at sf1 (2.59 vs 2.52 s, rep noise)
      // but strictly less shuffle mass at corpus scale, so this form
      // stays; tokenize-once checkpoint beats re-deriving toks in
      // each leg (2.59 vs 3.29 s). Per-stage at sf1: tokenize
      // checkpoint 1.31 s, + matched-term aggregate ≈ flat (1.29), +
      // dense leg 0.4, scoring windows + fusion the rest (~0.9).
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
        .localCheckpoint() // tokenize ONCE: read by doclen, qtf, cand
      val doclen = docs
        .select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
      val totals = doclen.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("total_dl"))
      val wQt = Window.partitionBy(col("query_id"))
        .orderBy(col("tf").desc, col("w"))
      val qtf = docs.filter(col("doc_id") < 8)
        .select(col("doc_id").as("query_id"),
          explode(col("toks")).as("w"))
        .groupBy(col("query_id"), col("w")).agg(count(lit(1)).as("tf"))
        .withColumn("trnk", row_number().over(wQt))
        .filter(col("trnk") <= 5)
        .select(col("query_id"), col("w"))
      // candidate postings: tf of every (query term, doc) pair — the
      // only corpus-shaped shuffle in the sparse leg, already
      // term-filtered below the exchange; df falls out of it
      val cand = docs.select(col("doc_id"), explode(col("toks")).as("w"))
        .join(broadcast(qtf.select(col("w")).distinct()), "w")
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
        .localCheckpoint() // read 2×: df table, scoring
      val dfTbl = cand.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val qterms = qtf.join(broadcast(dfTbl), "w")
        .select(col("query_id"), col("w"), col("df"))
      val wS = Window.partitionBy(col("query_id"))
        .orderBy(col("score_e6").desc, col("doc_id"))
      val sparse = cand.join(broadcast(qterms), "w")
        .join(doclen, "doc_id")
        .crossJoin(broadcast(totals))
        .withColumn("idf6", round(
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)
            + 1.0), 6))
        .withColumn("num", col("tf") * 44L * col("total_dl"))
        .withColumn("den", col("tf") * 20L * col("total_dl")
          + col("total_dl") * 6L + col("dl") * 18L * col("n_docs"))
        .withColumn("sc_e6", floor(col("idf6")
          * (col("num").cast("double") / col("den").cast("double"))
          * 1e6 + 0.5).cast("long"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("sc_e6")).as("score_e6"))
        .withColumn("r_sparse", row_number().over(wS).cast("long"))
        .filter(col("r_sparse") <= 50)
        .select(col("query_id"), col("doc_id"), col("r_sparse"))
      val e = t(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), toD(col("embedding")).as("qv"))
      val wD = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_e6").desc, col("doc_id"))
      val dense = e
        .select(col("vec_id").as("doc_id"), toD(col("embedding")).as("cv"))
        .crossJoin(broadcast(qv))
        .withColumn("cos_e6",
          floor(Similarity.cosine(col("qv"), col("cv")) * 1000000 + 0.5))
        .withColumn("r_dense", row_number().over(wD).cast("long"))
        .filter(col("r_dense") <= 50)
        .select(col("query_id"), col("doc_id"), col("r_dense"))
      val wF = Window.partitionBy(col("query_id"))
        .orderBy(col("rrf").desc, col("doc_id"))
      sparse.join(dense, Seq("query_id", "doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(expr("1000000000 div (60 + r_sparse)"), lit(0L))
            + coalesce(expr("1000000000 div (60 + r_dense)"), lit(0L)))
        .withColumn("rnk", row_number().over(wF).cast("long"))
        .filter(col("rnk") <= 10)
        .select(col("query_id"), col("rnk"), col("doc_id"), col("rrf"),
          coalesce(col("r_sparse"), lit(0L)).as("r_sparse"),
          coalesce(col("r_dense"), lit(0L)).as("r_dense"))
        .orderBy(col("query_id"), col("rnk"))
    }),

    // Z-ORDER LAYOUT WRITE (r11 verdict task 1b): x41 registers the
    // metric HARNESS — a global-ntile bucket model that quantifies
    // scan pruning on a demo — but the deployment operation is the
    // layout write itself: repartitionByRange(z) +
    // sortWithinPartitions (ZOrder.scala's own guard note), which
    // sorts each output file independently with NO global window.
    // This entry registers that path: compute the interleaved key
    // against broadcast bounds (all codegen'd integer arithmetic),
    // range-exchange the corpus on it, sort within partitions —
    // exactly the plan `OPTIMIZE ZORDER BY`-style layout jobs run,
    // minus the format-common parquet encode. The oracle recomputes
    // every row's z (bit-exact: same double-then-truncate normalize)
    // and orders by it, so DuckDB pays its own full sort same-session.
    "x93_zorder_write" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        unix_date(col("o_orderdate").cast("date")).cast("long").as("od"))
      val bounds = o.agg(
        min(col("o_custkey")).as("cmin"), max(col("o_custkey")).as("cmax"),
        min(col("od")).as("dmin"), max(col("od")).as("dmax"))
      o.crossJoin(broadcast(bounds))
        .withColumn("nx",
          ZOrder.normalize255(col("o_custkey"), col("cmin"), col("cmax")))
        .withColumn("ny",
          ZOrder.normalize255(col("od"), col("dmin"), col("dmax")))
        .withColumn("z", ZOrder.interleave8(col("nx"), col("ny")))
        .select(col("o_orderkey"), col("o_custkey"), col("od"), col("z"))
        .repartitionByRange(col("z"), col("o_orderkey"))
        .sortWithinPartitions(col("z"), col("o_orderkey"))
    }),

    // idf-WEIGHTED MinHash near-dup (integer-weight consistent
    // sampling + df-cut): corpus = documents ∪ near-dup copies (last 3
    // tokens dropped, a 24-token boilerplate footer appended — the
    // mirror-site shape that breaks UNWEIGHTED MinHash: the footer is
    // identical across all 500 copies, so its constant hashes hijack
    // signature minima corpus-wide and unrelated copy↔copy pairs
    // band-collide at quadratic mass). Weights are the exact-integer
    // df ladder (df=1→4 … df>64→0: the 0 tier deletes the footer from
    // the signature — see Dedup.idfWeight for why demotion-to-1 is NOT
    // enough), weighted MinHash = plain MinHash over the w-replicated
    // shingle set, and verification emits BOTH weighted and raw
    // Jaccard in integer ppm via the native intersect-size.
    "x98_weighted_minhash" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = Text.tokens(col("text"))
      val mutated = docs.select(
        (col("doc_id") + 10000).as("doc_id"),
        concat(
          array_join(slice(toks, lit(1), size(toks) - 3), " "),
          lit(" " + ExtQueries.Boilerplate)).as("text"))
      val corpus = spread(
        docs.select(col("doc_id"), col("text")).unionByName(mutated))
      val sh = corpus
        .withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), Text.wordShingles(col("t")).as("s"))
      Dedup.weightedNearDupPairs(sh, "doc_id", "s",
          numHashes = 16, bands = 4, thresholdPpm = 250000L)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // DATA-RECIPE EXECUTOR — the LLM pretraining mixture pattern
    // (GPT-3 Table 2.2 / LLaMA sampling proportions): per-source
    // TOKEN budgets from temperature weights w ∝ share^0.7 (x51 takes
    // doc-count quotas; a recipe is token-denominated), sources whose
    // budget exceeds their size get REPEATED (epochs: the "Wikipedia
    // ×4" pattern), and the final partial epoch realizes as a
    // seeded-md5-order prefix cut at the exact cumulative-token
    // boundary. All integer, overflow-conscious by construction:
    // pow() runs on the BOUNDED ppm share (never the raw token count,
    // so w_e6 ≤ 1.6e10 at any corpus size), shares normalize to ppm
    // before multiplying, and budget×share uses the exact split
    // multiply (b div 1e6)·s + ((b mod 1e6)·s) div 1e6 — every
    // intermediate < 2^63 for corpora to ~9e18 tokens. Output is one
    // row per (source, epoch): realized docs/tokens plus an exact
    // integer fingerprint of the selected doc set (Σid, Σid²), so the
    // hash compare pins the SELECTION, not just the counts. Scale
    // shape: two corpus passes (token count, selection), a
    // sources-sized plan table broadcast back, the partial-epoch
    // cumsum under a per-source KEYED window, and the repeated-epoch
    // explode is bounded by the token budget itself.
    "x99_data_recipe" -> ((s, dir) => {
      // deterministic per-source skew (size classes 1..10): the flat
      // synthetic source sizes would make every ratio ~0.5 and no
      // source would ever repeat; real recipes exist precisely because
      // source sizes span orders of magnitude
      // (sources here are doc_id % 20, so the class key must use
      // doc_id div 20 — the within-source index — to actually thin)
      val docs = t(s, dir, "documents")
        .filter(expr(
          "(doc_id div 20) % 10 < 1 + cast(substring(source, 4) as int) % 10"))
        .select(col("source"), col("doc_id"),
          size(Text.tokens(col("text"))).cast("long").as("n_toks"))
      val bySrc = docs.groupBy(col("source"))
        .agg(sum(col("n_toks")).as("src_toks"))
      val totals = bySrc.agg(sum(col("src_toks")).as("corpus_toks"))
      val plan = bySrc.crossJoin(broadcast(totals))
        .withColumn("ppm",
          greatest(expr("(src_toks * 1000000) div corpus_toks"), lit(1L)))
        .withColumn("w_e6",
          round(round(pow(col("ppm").cast("double"), 0.7), 6) * 1e6)
            .cast("long"))
      val sharePlan = plan
        .crossJoin(broadcast(plan.agg(sum(col("w_e6")).as("total_w"))))
        .withColumn("share_ppm", expr("(w_e6 * 1000000) div total_w"))
        .withColumn("budget", col("corpus_toks"))
        .withColumn("target_toks", expr(
          "(budget div 1000000) * share_ppm" +
            " + ((budget % 1000000) * share_ppm) div 1000000"))
        .withColumn("repeat_factor",
          expr("(target_toks + src_toks - 1) div src_toks"))
        .withColumn("remainder",
          expr("target_toks - (repeat_factor - 1) * src_toks"))
        .select(col("source"), col("src_toks"), col("share_ppm"),
          col("target_toks"), col("repeat_factor"), col("remainder"))
        .localCheckpoint() // sources-sized
      val wCum = Window.partitionBy(col("source"))
        .orderBy(col("rk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val partial = docs
        .join(broadcast(sharePlan
          .select(col("source"), col("repeat_factor"), col("remainder"))),
          "source")
        .withColumn("rk",
          md5(concat(col("doc_id").cast("string"), lit("#42"))))
        .withColumn("cum_before",
          coalesce(sum(col("n_toks")).over(wCum), lit(0L)))
        .filter(col("cum_before") < col("remainder"))
        .select(col("source"), col("repeat_factor").as("epoch"),
          col("doc_id"), col("n_toks"))
      val full = docs
        .join(broadcast(sharePlan.filter(col("repeat_factor") > 1)
          .select(col("source"), col("repeat_factor"))), "source")
        .select(col("source"),
          explode(sequence(lit(1L), col("repeat_factor") - 1)).as("epoch"),
          col("doc_id"), col("n_toks"))
      // selection fingerprint in a BOUNDED residue (doc_id mod a
      // prime): raw doc_id² overflowed a long the moment MakeSf's
      // shift band widened to 10⁸ for the sf10 receipt (round-15) —
      // (9.9e9)² alone exceeds Long.Max. The residue keeps fp² ≤
      // ~1e12, so the per-group sum is exact to ~9e6 docs/group at
      // any corpus size, and the fingerprint still pins membership.
      val fp = pmod(col("doc_id"), lit(1000003L))
      full.unionByName(partial)
        .groupBy(col("source"), col("epoch"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("n_tokens"),
          sum(fp).as("fp_sum"),
          sum(fp * fp).as("fp_sq"))
        .orderBy(col("source"), col("epoch"))
    }),

    // HARD-NEGATIVE MINING for embedding-model training (the ANCE /
    // RocketQA denoising rule): for each anchor, positive = its
    // nearest neighbor; negatives = later neighbors whose similarity
    // sits at least a margin BELOW the positive's — near-ties are
    // likely unlabeled positives (the published false-negative
    // hazard), so they are dropped, not mined. Output = training
    // triplets (query, pos, neg) with exact-integer scores: cosines
    // in the x03 floor-e6 units, the margin an integer subtraction,
    // both rank windows KEYED by query. The candidate pool truncates
    // to top-50 BEFORE mining (bounded per anchor at any corpus
    // size); at production corpus the pool swaps to the x87 IVF
    // serve join — same mining logic downstream.
    "x100_hard_negatives" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("query_id"), toD(col("embedding")).as("qv"))
      val c = e.select(col("vec_id").as("cand_id"), toD(col("embedding")).as("cv"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_e6").desc, col("cand_id"))
      val ranked = c.crossJoin(broadcast(q))
        .filter(col("cand_id") =!= col("query_id"))
        .withColumn("cos_e6",
          floor(Similarity.cosine(col("qv"), col("cv")) * 1000000 + 0.5))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 50)
        .select(col("query_id"), col("cand_id"), col("cos_e6"), col("rnk"))
        .localCheckpoint() // 16×50 rows, read twice: positives + mining
      val pos = ranked.filter(col("rnk") === 1)
        .select(col("query_id"), col("cand_id").as("pos_id"),
          col("cos_e6").as("pos_e6"))
      val wN = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_e6").desc, col("cand_id"))
      ranked.filter(col("rnk") > 1)
        .join(broadcast(pos), "query_id")
        .filter(col("cos_e6") <= col("pos_e6") - 50000L)
        .withColumn("neg_rnk", row_number().over(wN).cast("long"))
        .filter(col("neg_rnk") <= 5)
        .select(col("query_id"), col("pos_id"), col("pos_e6"),
          col("neg_rnk"), col("cand_id").as("neg_id"),
          col("cos_e6").as("neg_e6"))
        .orderBy(col("query_id"), col("neg_rnk"))
    }),

    // MODEL-BASED QUALITY FILTERING — multinomial Naive Bayes (the
    // GPT-3 / PaLM quality-classifier pattern: train a cheap linear
    // classifier on a curated positive set, score the corpus, gate on
    // the log-odds sign). Train on the doc_id%3==0 split, score the
    // HELD-OUT docs. The synthetic corpus has class-independent token
    // frequencies, so the fixture plants the signal the classifier
    // must LEARN from counts, never told: even-id English docs swap
    // two common tokens for class-specific variants ('data'→'datum',
    // 'table'→'tbl') — the learned llr table has to discover the
    // variants as positive indicators and their originals as negative
    // ones (NbQualitySpec pins exactly that, plus hand-computed model
    // weights on a fixture). Model weights are the x44 quantized-ln
    // integer lift, so the LEARNED MODEL and every score hash-prove
    // cross-engine. Scale shape: ext/NaiveBayes — one corpus explode
    // into a vocabulary-bounded count aggregate (map-side combine, the
    // x96 type-table posture), the vocabulary-sized model joined back
    // onto the held-out token stream, one per-doc hash agg.
    "x101_nb_quality" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
        .withColumn("label", when(col("lang") === "en", 1L).otherwise(0L))
        .withColumn("t0", Text.tokens(col("text")))
        .withColumn("t",
          when((col("label") === 1L) && (col("doc_id") % 2 === 0),
            expr("transform(t0, x -> CASE WHEN x = 'data' THEN 'datum' " +
              "WHEN x = 'table' THEN 'tbl' ELSE x END)"))
            .otherwise(col("t0")))
        .select(col("doc_id"), col("label"), col("t"))
      val trainSet = docs.filter(col("doc_id") % 3 === 0)
      val holdout = docs.filter(col("doc_id") % 3 =!= 0)
      val (model, consts) = NaiveBayes.train(trainSet, "t", "label")
      NaiveBayes.score(holdout, Seq("doc_id", "label"), "t", model, consts)
        .orderBy(col("doc_id"))
    }),

    // CLASSIFIER-GATED ACCEPTANCE SAMPLING — the GPT-3 document-
    // retention rule (Appendix A: keep iff score > 1 − Pareto(α=9)
    // draw), determinized: low-quality docs still survive occasionally
    // (distribution coverage) while high-quality docs almost surely
    // stay; expected retention ≈ (1 − 2⁻⁸)/8 ≈ 12.4% of the corpus.
    // Quality score = distinct-token ratio in ppm (the x57 metric;
    // at production the x101 classifier score drops in unchanged),
    // normalized to a ppm PERCENTILE RANK via the x86/x91 two-level
    // rank — score_ppm is value-bounded in [0, 1e6], so 4096-wide
    // buckets cap the offset table at ≤245 rows and nothing
    // corpus-sized ever crosses one partition. The Pareto draw is
    // md5-seeded and quantized (round(pow(·), 6) BEFORE the integer
    // lift — the x99 pow discipline), so the kept SET is
    // hash-provable. Output is row-per-doc with the full audit trail
    // (u, draw, rank) — the sampling decision is replayable.
    "x102_quality_accept" -> ((s, dir) => {
      val scored = spread(t(s, dir, "documents"))
        .withColumn("t", Text.tokens(col("text")))
        .withColumn("n_toks", size(col("t")).cast("long"))
        .filter(col("n_toks") > 0)
        .withColumn("score_ppm",
          expr("CAST(size(array_distinct(t)) AS BIGINT) * 1000000" +
            " div n_toks"))
        .select(col("doc_id"), col("score_ppm"))
        .withColumn("b", expr("score_ppm div 4096"))
      val totals = scored.agg(count(lit(1)).as("n_total"))
      val offs = scored.groupBy(col("b")).agg(count(lit(1)).as("cnt"))
      val wO = Window.orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = offs
        .withColumn("off", coalesce(sum(col("cnt")).over(wO), lit(0L)))
        .select(col("b"), col("off"))
      val wB = Window.partitionBy(col("b"))
        .orderBy(col("score_ppm"), col("doc_id"))
      scored
        .join(broadcast(offsets), "b")
        .crossJoin(broadcast(totals))
        .withColumn("rnk", col("off") + row_number().over(wB).cast("long"))
        .withColumn("rank_ppm",
          expr("((rnk - 1) * 1000000) div greatest(n_total - 1, 1)"))
        .withColumn("u_ppm",
          expr("CAST(conv(substring(md5(CAST(doc_id AS STRING) || " +
            "'#acc'), 1, 8), 16, 10) AS BIGINT) % 1000000"))
        // the exponent must be a SCALA double (-1.0/9.0): in Spark SQL
        // text that literal division is DECIMAL(.,6) arithmetic, and a
        // -0.111111 exponent undershoots every draw by ~1.3e-7
        // relative — enough to flip the 6th decimal on 14% of rows
        .withColumn("pareto_e6",
          round(round(
            pow(lit(1.0) - col("u_ppm").cast("double") / 1000000.0,
              -1.0 / 9.0) - lit(1.0), 6) * 1e6).cast("long"))
        .withColumn("keep", col("rank_ppm") + col("pareto_e6") > 1000000L)
        .select(col("doc_id"), col("score_ppm"), col("rnk"),
          col("rank_ppm"), col("u_ppm"), col("pareto_e6"), col("keep"))
        .orderBy(col("doc_id"))
    }),

    // TOKENIZER FERTILITY AUDIT — per-language tokens-per-character
    // under a frozen BPE vocabulary (the published tokenizer-fairness
    // question: a vocabulary trained on one language mix "charges"
    // other languages more tokens per character, inflating their
    // effective sequence length and training cost). Rules trained on
    // the 10% sample (x92's serve recipe verbatim), applied
    // corpus-wide, then ONE language-keyed aggregate: fertility =
    // encoded tokens per character and compression vs the whitespace
    // baseline, both in exact integer ppm. Scale shape: the x92
    // encode (3 bounded rule broadcasts + narrow rewrites) + a
    // languages-sized aggregate — nothing new shuffles.
    "x103_tokenizer_fertility" -> ((s, dir) => {
      import graft.ext.BpeMerge
      val docs = spread(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), Text.tokens(col("text")).as("toks"),
          length(col("text")).cast("long").as("n_chars"))
      val rules = BpeMerge.topPairs(
        docs.filter(col("doc_id") % 10 === 0), k = 3).localCheckpoint()
      val pairs = (1 to 3).map(i =>
        rules.filter(col("r") === i).select(col("ma"), col("mb")))
      val base = docs.select(col("doc_id"), col("lang"), col("n_chars"),
        size(col("toks")).cast("long").as("ws_tokens"))
      BpeMerge.encode(docs, pairs)
        .select(col("doc_id"), size(col("toks")).cast("long").as("bpe_tokens"))
        .join(base, "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars"),
          sum(col("ws_tokens")).as("ws_tokens"),
          sum(col("bpe_tokens")).as("bpe_tokens"))
        .withColumn("fertility_ppm",
          expr("(bpe_tokens * 1000000) div chars"))
        .withColumn("compression_ppm",
          expr("(bpe_tokens * 1000000) div ws_tokens"))
        .orderBy(col("lang"))
    }),

    // UNICODE NORMALIZATION + FORMAT-CHAR CLEANUP — the first step of
    // every published text pipeline: web text mixes composed and
    // decomposed grapheme forms ("é" vs "e"+U+0301) and carries
    // invisible format characters (ZWSP, soft hyphen), which
    // fractionate exact dedup, shingles and token counts. Spark has no
    // built-in normalizer, so this is the 10th native expression
    // (UnicodeNormalize — JDK UAX #15, byte-identical to DuckDB's
    // utf8proc nfc_normalize). The corpus is ASCII, so the fixture
    // DIRTIES it first with the decomposed/format forms the operator
    // must repair (every 'a' → 'a'+COMBINING ACUTE, every 'e' →
    // 'e'+ZWSP), identically in both engines. Scale shape: a pure
    // narrow map — no shuffle, no state; the only exchange is the
    // output sort.
    "x104_unicode_normalize" -> ((s, dir) => {
      val dirty = spread(t(s, dir, "documents"))
        .withColumn("dirty", regexp_replace(
          regexp_replace(col("text"), "a", "a\u0301"), "e", "e\u200B"))
      dirty
        .withColumn("nfc", Text.unicodeNormalize(col("dirty"), "NFC"))
        .withColumn("clean",
          regexp_replace(col("nfc"), "[\u200B\u00AD]", ""))
        .select(col("doc_id"),
          length(col("dirty")).cast("long").as("n_dirty"),
          length(col("nfc")).cast("long").as("n_nfc"),
          length(col("clean")).cast("long").as("n_clean"),
          (length(col("dirty")) - length(col("nfc"))).cast("long")
            .as("n_composed"),
          md5(col("clean").cast("binary")).as("clean_hash"))
        .orderBy(col("doc_id"))
    }),

    // CLASSIFIER CALIBRATION (ECE) — the reliability diagram + expected
    // calibration error of the x101 quality classifier (Guo et al.
    // 2017's evaluation: a filter gating on p>τ needs p to MEAN its
    // confidence). Same train/score split and planted fixture as x101;
    // scores map to probabilities via a quantized sigmoid (round(·,6)
    // BEFORE the integer lift — the x44 libm discipline), then 10
    // equal-width probability bins. All calibration arithmetic is
    // EXACT integer: per-bin gap n_b·|acc−conf| in e6 units is
    // |n_pos·1e6 − Σp_e6| (two integer sums), and ECE_e6 = Σ gaps div
    // N — no float means, so the hash pins the entire diagram. Scale
    // shape: x101's vocabulary-bounded train + linear score, then ONE
    // 10-row aggregate; the ECE constant rides a 1-row broadcast (the
    // standing BNLJ scalar shape).
    "x105_calibration_ece" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
        .withColumn("label", when(col("lang") === "en", 1L).otherwise(0L))
        .withColumn("t0", Text.tokens(col("text")))
        .withColumn("t",
          when((col("label") === 1L) && (col("doc_id") % 2 === 0),
            expr("transform(t0, x -> CASE WHEN x = 'data' THEN 'datum' " +
              "WHEN x = 'table' THEN 'tbl' ELSE x END)"))
            .otherwise(col("t0")))
        .select(col("doc_id"), col("label"), col("t"))
      val trainSet = docs.filter(col("doc_id") % 3 === 0)
      val holdout = docs.filter(col("doc_id") % 3 =!= 0)
      val (model, consts) = NaiveBayes.train(trainSet, "t", "label")
      val bins = NaiveBayes
        .score(holdout, Seq("doc_id", "label"), "t", model, consts)
        .withColumn("p_e6", round(round(
          lit(1.0) / (lit(1.0) + exp(-col("score_e6").cast("double") / 1e6)),
          6) * 1e6).cast("long"))
        .withColumn("bin", least(expr("p_e6 div 100000"), lit(9L)))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("label")).as("n_pos"),
          sum(col("p_e6")).as("sum_p_e6"))
        .withColumn("gap_e6n",
          abs(col("n_pos") * 1000000L - col("sum_p_e6")))
        // ≤10 rows (the bin table), read twice: once for the ECE total,
        // once as the output rows. Without the checkpoint both readers
        // re-ran the ENTIRE train+score+bin pipeline — the round-16
        // plan audit counted the corpus scan 6× / 74 Exchanges in one
        // query; with it (plus train's counts checkpoint) the corpus
        // is tokenized once per logical pass.
        .localCheckpoint()
      val tot = bins.agg(sum(col("n")).as("n_total"),
        sum(col("gap_e6n")).as("gap_total"))
      bins.crossJoin(broadcast(tot))
        .select(col("bin"), col("n"), col("n_pos"),
          expr("sum_p_e6 div n").as("conf_e6"),
          expr("(n_pos * 1000000) div n").as("acc_e6"),
          col("gap_e6n"),
          expr("gap_total div n_total").as("ece_e6"))
        .orderBy(col("bin"))
    }),

    // PAIRWISE PREFERENCE AGGREGATION — Bradley–Terry strengths via
    // Hunter (2004)'s MM iteration, the aggregation step of RLHF /
    // preference-data curation (turn noisy pairwise "A beats B"
    // judgments into per-item strengths and a leaderboard). The
    // fixture synthesizes one judgment per document over 100 items
    // with planted strengths (p(a wins) = (a+1)/(a+b+2), decided by an
    // md5 uniform as an exact integer comparison — no float draw), so
    // the MM rounds must RECOVER the planted ordering from outcomes
    // alone (BradleyTerrySpec pins the rank correlation). All MM
    // arithmetic is exact integer in e6/e12 units: per-pair denom
    // contributions are integer divs and per-item sums are order-free
    // integer sums, so the learned strengths hash-prove cross-engine
    // with NO libm anywhere (stronger than the round(·,6) discipline).
    // A +1-win ghost game vs a strength-1 opponent is the standard MAP
    // regularization keeping zero-win items finite, and a strength
    // floor of 1 (= 1e-6) makes the e12 divisions total. Scale shape:
    // ONE corpus-shaped aggregate into the items²-bounded pair table
    // (map-side combined — the corpus shuffle carries pair counts,
    // never judgments), then every MM round touches only the pair
    // table + item-sized broadcasts (the x70 bounded-iteration
    // posture); the corpus is never re-read. BT is invariant to
    // scaling all (n_ij, W_i) by a common factor, so at judgment
    // counts beyond the e12 guard the pair table is divided down,
    // never re-derived.
    "x106_bradley_terry" -> ((s, dir) => {
      val games = spread(t(s, dir, "documents"))
        .select(col("doc_id"),
          (col("doc_id") % 100).as("ia"),
          ((col("doc_id") * 31 + 7) % 100).as("ib"))
        .filter(col("ia") =!= col("ib"))
        .withColumn("u_ppm",
          expr("CAST(conv(substring(md5(CAST(doc_id AS STRING) || '#bt'), " +
            "1, 8), 16, 10) AS BIGINT) % 1000000"))
        .withColumn("a_wins",
          col("u_ppm") * (col("ia") + col("ib") + 2) <
            (col("ia") + 1) * 1000000L)
      val pairs = games
        .withColumn("lo", least(col("ia"), col("ib")))
        .withColumn("hi", greatest(col("ia"), col("ib")))
        .withColumn("lo_win",
          when(col("a_wins") === (col("ia") === col("lo")), 1L)
            .otherwise(0L))
        .groupBy(col("lo"), col("hi"))
        .agg(count(lit(1)).as("n"), sum(col("lo_win")).as("w_lo"))
      val wRank = Window.orderBy(col("s_e6").desc, col("item"))
      BradleyTerry.fit(pairs, iters = 3)
        .withColumn("rnk", row_number().over(wRank).cast("long"))
        .select(col("item"), col("games"), col("wins"), col("s_e6"),
          col("rnk"))
        .orderBy(col("item"))
    }),

    // DIALOGUE CONTEXT PACKING — per-user sliding (context, target)
    // training pairs from the event stream: the chat-data prep step
    // that turns interaction logs into next-action prediction examples
    // (context = up to 4 preceding events in time order, target = the
    // current one). One shuffle keyed on user_id serves BOTH window
    // functions (same partition + order → one sort); the context
    // list is a bounded ROWS frame, so state per row is ≤ 4 elements
    // at any corpus size — nothing global, nothing unbounded. The
    // streaming twin (StreamContext) assembles the same pairs
    // incrementally with mapGroupsWithState.
    "x107_context_windows" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val frame = w.rowsBetween(-4, -1)
      spread(t(s, dir, "events"))
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"))
        .withColumn("seq", row_number().over(w).cast("long"))
        .withColumn("ctx", collect_list(col("event_type")).over(frame))
        .filter(col("seq") > 1)
        .select(col("user_id"), col("seq"), col("event_id"),
          array_join(col("ctx"), " ").as("context"),
          col("event_type").as("target"))
        .orderBy(col("user_id"), col("seq"))
    }),

    // RETRIEVAL EVALUATION (MRR / recall@k) — the self-retrieval eval
    // of a sparse index: each query of a FIXED 20-doc eval set (the
    // x03/x72 bounded-query-set convention — an eval set is
    // curator-sized, never corpus-proportional; a %-of-corpus set was
    // measured at 85 s/100M candidate pairs at sf1 on this
    // shared-vocabulary corpus) is the doc's 3 RAREST terms (lowest
    // df — the discriminative ones), the gold answer is the document
    // itself, and the x94 BM25 integer scorer ranks the
    // inverted-index candidates. Reported per query: gold rank,
    // reciprocal rank (exact ppm), hit@1/5/10, plus corpus MRR as the
    // 1-row broadcast constant (the standing BNLJ scalar shape). Scale
    // shape: candidates come ONLY from the postings⋈query-terms
    // equi-join (rare terms → short postings lists — the classic
    // inverted-index bound); per-query ranking is a KEYED window; no
    // global window, no cross join beyond the 1-row totals.
    "x108_retrieval_eval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // ONE exchange keyed on doc_id up front: the (doc_id, w) tf
      // aggregate AND doclen both group on doc_id-prefixed keys, so
      // the exploded token stream never crosses the wire (hash keys
      // subset of grouping keys - the x70 recipe). sf1 A/B receipts
      // (PLANS.md round-12 session 3): checkpoint-dropped 3.15 s vs
      // 2.44 s kept; this repartition flat at sf1 (40-token docs) but
      // strictly better at real document lengths, where the exploded
      // stream dwarfs the doc stream. Remaining 2.4 s is the x97
      // floor class: corpus checkpoint + ~4 scheduled job launches.
      val postings = docs
        .repartition(docs.sparkSession.sparkContext.defaultParallelism,
          col("doc_id"))
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
        .localCheckpoint() // read 3x: df table, doc lengths, scoring
      val doclen = postings.groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("dl"))
      val totals = doclen.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("total_dl"))
      val dfTbl = postings.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val wQ = Window.partitionBy(col("qid")).orderBy(col("df"), col("w"))
      val qterms = postings.filter(col("doc_id") < 20)
        .select(col("doc_id").as("qid"), col("w"))
        .join(dfTbl, "w")
        .withColumn("trnk", row_number().over(wQ))
        .filter(col("trnk") <= 3)
        .select(col("qid"), col("w"), col("df"))
      val wRank = Window.partitionBy(col("qid"))
        .orderBy(col("score_e6").desc, col("doc_id"))
      val ranked = postings.join(qterms, "w")
        .join(doclen, "doc_id")
        .crossJoin(broadcast(totals))
        .withColumn("idf6", round(
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)
            + 1.0), 6))
        .withColumn("num", col("tf") * 44L * col("total_dl"))
        .withColumn("den", col("tf") * 20L * col("total_dl")
          + col("total_dl") * 6L + col("dl") * 18L * col("n_docs"))
        .withColumn("sc_e6", floor(col("idf6")
          * (col("num").cast("double") / col("den").cast("double"))
          * 1e6 + 0.5).cast("long"))
        .groupBy(col("qid"), col("doc_id"))
        .agg(sum(col("sc_e6")).as("score_e6"))
        .withColumn("rnk", row_number().over(wRank).cast("long"))
      val perQ = ranked
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_cands"),
          min(when(col("doc_id") === col("qid"), col("rnk")))
            .as("gold_rank"))
        .withColumn("rr_ppm", when(col("gold_rank") <= 10,
          expr("1000000 div gold_rank")).otherwise(lit(0L)))
        .withColumn("hit1", (col("gold_rank") === 1L).cast("long"))
        .withColumn("hit5", (col("gold_rank") <= 5L).cast("long"))
        .withColumn("hit10", (col("gold_rank") <= 10L).cast("long"))
      val agg = perQ.agg(count(lit(1)).as("n_queries"),
        sum(col("rr_ppm")).as("rr_sum"))
      perQ.crossJoin(broadcast(agg))
        .select(col("qid"), col("n_cands"), col("gold_rank"),
          col("rr_ppm"), col("hit1"), col("hit5"), col("hit10"),
          expr("rr_sum div n_queries").as("mrr_ppm"))
        .orderBy(col("qid"))
    }),

    // DIFFERENTIALLY-PRIVATE CORPUS STATISTICS — the privacy-preserving
    // dataset-card numbers (Dwork et al.'s Laplace mechanism,
    // determinized): per-source doc counts and mean doc length
    // released under a total ε=1 budget split ε/2 + ε/2, with the
    // standard clip-then-noise recipe — per-doc length contribution
    // clipped at 256 (sensitivity bound), count sensitivity 1, so
    // b_count = 2 and b_sum = 512. The Laplace draw is the md5-seeded
    // inverse CDF −b·sgn(v)·ln(1−2|v|) with the ln round(·,6)-quantized
    // (the x44 libm discipline; the CDF argument is an exact ppm
    // rational, clamped ≥ 1 ppm so the transform is total), u values
    // emitted per row — the x102 replayable-audit convention. The
    // released mean uses non-negative clamps so both engines' integer
    // division agrees (Spark div truncates, DuckDB // floors — equal
    // only on non-negatives; a dataset card reports non-negative
    // means anyway). Scale shape: ONE sources-bounded aggregate
    // (map-side combined) + narrow per-group noise arithmetic —
    // nothing corpus-sized past the first agg.
    "x109_dp_stats" -> ((s, dir) => {
      def uPpm(tag: String): Column =
        expr(s"CAST(conv(substring(md5(source || '$tag'), 1, 8), 16, 10)" +
          " AS BIGINT) % 1000000")
      def lap(u: Column, b: Double): Column = {
        val v = u - 500000L
        val arg = greatest(lit(1000000L) - abs(v) * 2L, lit(1L))
        val q = round(log(arg.cast("double") / 1e6), 6)
        round(signum(v.cast("double")) * lit(-b) * q).cast("long")
      }
      spread(t(s, dir, "documents"))
        .withColumn("clip", least(col("n_chars"), lit(256L)))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("clip")).as("clip_sum"))
        .withColumn("u1_ppm", uPpm("#dpc"))
        .withColumn("u2_ppm", uPpm("#dps"))
        .withColumn("dp_n_docs", col("n_docs") + lap(col("u1_ppm"), 2.0))
        .withColumn("dp_sum", col("clip_sum") + lap(col("u2_ppm"), 512.0))
        .withColumn("dp_mean_ppm",
          expr("(greatest(dp_sum, CAST(0 AS BIGINT)) * 1000000) div " +
            "greatest(dp_n_docs, CAST(1 AS BIGINT))"))
        .select(col("source"), col("n_docs"), col("clip_sum"),
          col("u1_ppm"), col("u2_ppm"), col("dp_n_docs"), col("dp_sum"),
          col("dp_mean_ppm"))
        .orderBy(col("source"))
    }),

    // RENDEZVOUS (HRW) SHARDING — elastic data placement: every doc
    // hashes a weight against each shard id and lands on the argmax,
    // so growing the shard set from 8 to 9 moves ONLY the docs the new
    // shard wins (expected 1/9 of the corpus — the minimal-movement
    // property consistent hashing exists for; RoundTwelveBSpec pins
    // moved ⟺ shard9 = 8 exactly and the fraction band). Weights are
    // the first 15 md5 hex digits as an integer (60 bits — tie-free in
    // practice, shard-id tiebreak stated anyway). Scale shape: the
    // shard spine is a bounded broadcast (9 rows — the standing
    // bounded-BNLJ class), per-doc argmax runs under doc-keyed
    // windows; nothing grows past corpus × |shards|.
    "x110_rendezvous_sharding" -> ((s, dir) => {
      val shards = s.range(9).select(col("id").as("shard"))
      val base = spread(t(s, dir, "documents")).select(col("doc_id"))
        .crossJoin(broadcast(shards))
        .withColumn("w",
          expr("CAST(conv(substring(md5(CAST(doc_id AS STRING) || '#rv'" +
            " || CAST(shard AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
      val wD = Window.partitionBy(col("doc_id"))
        .orderBy(col("w").desc, col("shard"))
      val s9 = base.withColumn("rn", row_number().over(wD))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("shard").as("shard9"))
      val s8 = base.filter(col("shard") < 8)
        .withColumn("rn", row_number().over(wD))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("shard").as("shard8"))
      s8.join(s9, "doc_id")
        .withColumn("moved", col("shard8") =!= col("shard9"))
        .orderBy(col("doc_id"))
    }),

    // WINNOWING FINGERPRINTS — the MOSS local fingerprinting scheme
    // (Schleimer/Wilkerson/Aiken 2003; ext/Winnow documents the
    // rightmost-tie-break encoding and the w+k−1 match guarantee).
    // Corpus plants INSERTION-SHIFTED near-duplicates (three tokens
    // prepended, id+10000) — the case positional hashing misses and
    // winnowing exists for: fingerprints match by HASH, not position,
    // so every copy pair shares most fingerprints while the 500
    // originals share only vocabulary-collision grams. Output is the
    // per-doc fingerprint count, the count shared with ≥2 docs, and
    // the share ratio that gates near-dup review. Scale shape: narrow
    // gram hashing, one doc-keyed exchange for selection (count +
    // frame-min share the partitioning), one fp_h-keyed exchange for
    // sharing (x55's min≠max constant-state rule) — all linear,
    // fingerprint stream ~2/(w+1)=1/3 of the gram stream.
    "x111_winnowing" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = spread(docs.select(col("doc_id"), col("text"))
        .unionByName(docs.select((col("doc_id") + 10000).as("doc_id"),
          concat(lit("inserted preamble marker "), col("text"))
            .as("text"))))
      val fps = Winnow.fingerprints(
        corpus.withColumn("t", Text.tokens(col("text"))), "t", 4, 5)
      Winnow.summary(fps)
        .withColumn("near_dup", col("share_ppm") >= 500000L)
        .orderBy(col("doc_id"))
    }),

    // DSIR — data selection via importance resampling (Xie et al.,
    // NeurIPS 2023): hashed n-gram features (unigrams + bigrams into
    // 64 buckets), bucket log-ratio weights between a TARGET
    // distribution (the lang='en' slice standing in for the curated
    // target) and the RAW corpus, per-doc importance = Σ features'
    // log-ratios, then Gumbel top-k — the exact sampling-without-
    // replacement the paper uses, determinized: u from md5, both lns
    // re-integerized through the round(·,6)·1e6 lift BEFORE feeding
    // the next ln, so the nested transform stays bit-identical
    // cross-engine (each ln's input is an exact e6 rational). Add-1
    // smoothing keeps every bucket finite; the two lns are kept
    // separate so no integer product can overflow. Scale shape: the
    // feature stream is 2×tokens narrow; BOTH distributions are one
    // map-side-combined agg into a 64-row model broadcast back onto
    // the stream; per-doc weights are one doc-keyed agg; top-k is
    // TakeOrderedAndProject (no global sort materializes); the final
    // rank window orders a ≤100-row set — the standing bounded-domain
    // class.
    "x112_dsir" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
        .withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= 2)
      val feats = docs.select(col("doc_id"), col("lang"),
        explode(Dsir.featureArray(col("t"))).as("f"))
        .withColumn("b", Dsir.bucket(col("f")))
      val lam = Dsir.lambdaTable(feats, col("lang") === "en")
      val wts = feats.join(broadcast(lam), "b")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_feats"), sum(col("lam_e6")).as("w_e6"))
        .withColumn("u_ppm", expr("CAST(conv(substring(md5(" +
          "CAST(doc_id AS STRING) || '#dsir'), 1, 8), 16, 10) " +
          "AS BIGINT) % 1000000"))
        // −ln u in e6 (u clamped off 0), then −ln of THAT exact
        // rational: the Gumbel lift g = −ln(−ln u), each step
        // quantized and re-integerized
        .withColumn("nl_e6",
          (-round(round(log(greatest(col("u_ppm"), lit(1L))
            .cast("double") / 1e6), 6) * 1e6)).cast("long"))
        .withColumn("g_e6",
          (-round(round(log(col("nl_e6").cast("double") / 1e6), 6)
            * 1e6)).cast("long"))
        .withColumn("score_e6", col("w_e6") + col("g_e6"))
      val top = wts
        .orderBy(col("score_e6").desc, col("doc_id")).limit(100)
      top.withColumn("rnk", row_number().over(
          Window.orderBy(col("score_e6").desc, col("doc_id")))
          .cast("long"))
        .select(col("doc_id"), col("n_feats"), col("w_e6"),
          col("u_ppm"), col("g_e6"), col("score_e6"), col("rnk"))
        .orderBy(col("rnk"))
    }),

    // CAPTURE–RECAPTURE DUPLICATE-RATE ESTIMATE — corpus QA without
    // running the dedup: estimate the distinct-text count from two
    // independent text-level hash samples (Chapman's bias-corrected
    // Lincoln–Petersen estimator), compare against the row count for
    // the duplicate mass, and carry the TRUE values alongside so the
    // estimate's error is part of the output. Capture membership is
    // decided on the CONTENT hash (md5(ch||salt) < 40%), so every
    // text has equal catchability regardless of its multiplicity —
    // the assumption the estimator needs, satisfied by construction
    // (row-level sampling would overweight heavy duplicates). Corpus
    // plants skewed multiplicities 1..4 via doc_id%4. Scale shape:
    // ONE content-hash agg (the x01 exact-dedup shuffle) collapsed to
    // per-text capture bits, then a single bounded reduce to one row;
    // the estimate needs no second pass over the corpus.
    "x113_caprecap" -> ((s, dir) => {
      val corpus = spread(t(s, dir, "documents")
        .select(col("doc_id"), col("text")))
        .withColumn("copy", explode(expr(
          "sequence(0, CAST(doc_id % 4 AS INT))")))
        .select((col("doc_id") + col("copy") * 10000).as("doc_id"),
          col("text"))
      def captured(tag: String): Column =
        expr(s"CAST(conv(substring(md5(ch || '$tag'), 1, 8), 16, 10) " +
          "AS BIGINT) % 1000000") < 400000L
      val perText = corpus.withColumn("ch", md5(col("text")))
        .groupBy(col("ch"))
        .agg(count(lit(1)).as("n_rows"))
        .withColumn("c1", captured("#c1").cast("long"))
        .withColumn("c2", captured("#c2").cast("long"))
      perText.agg(
          sum(col("n_rows")).as("n_rows"),
          count(lit(1)).as("true_distinct"),
          sum(col("c1")).as("n1"),
          sum(col("c2")).as("n2"),
          sum(col("c1") * col("c2")).as("m"))
        .withColumn("est_distinct",
          expr("((n1 + 1) * (n2 + 1)) div (m + 1) - 1"))
        .withColumn("dup_rate_ppm", expr(
          "greatest(n_rows - est_distinct, CAST(0 AS BIGINT)) " +
            "* 1000000 div n_rows"))
        .withColumn("true_dup_rate_ppm", expr(
          "(n_rows - true_distinct) * 1000000 div n_rows"))
        .select(col("n_rows"), col("n1"), col("n2"), col("m"),
          col("est_distinct"), col("true_distinct"),
          col("dup_rate_ppm"), col("true_dup_rate_ppm"))
    }),

    // TEMPERATURE-SCALED DOMAIN MIXING — the multilingual/multi-source
    // sampling-rate law (mC4 / XLM-R: sample source s with
    // w_s ∝ p_s^α, α=0.5, where p_s is the source's natural token
    // share): upweights the tail sources, downweights the head, and
    // the w/p ratio IS the effective epoch (repetition) factor each
    // source trains at under the reweighted budget. All arithmetic
    // past the corpus agg is exact-integer ppm: p in ppm, p^α through
    // the round(pow,6)·1e6 lift (host-double exponent — the x102
    // decimal-division trap note), renormalized by the integer sum.
    // Scale shape: ONE map-side-combined sources-bounded agg; the
    // spine after it is sources-sized (bounded broadcast class);
    // nothing else touches the corpus.
    "x114_temperature_mix" -> ((s, dir) => {
      val stats = spread(t(s, dir, "documents"))
        .withColumn("n_toks", size(Text.tokens(col("text"))).cast("long"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
        .localCheckpoint() // sources-bounded (~20 rows), read by three
      // consumers — without the cut each one re-tokenizes the corpus
      val tot = stats.agg(sum(col("n_tokens")).as("tot"))
      val p = stats.crossJoin(broadcast(tot))
        .withColumn("p_ppm", expr("n_tokens * 1000000 div tot"))
        .withColumn("pw_e6",
          round(round(pow(col("p_ppm").cast("double") / 1e6, 0.5), 6)
            * 1e6).cast("long"))
      val z = p.agg(sum(col("pw_e6")).as("z"))
      p.crossJoin(broadcast(z))
        .withColumn("w_ppm", expr("pw_e6 * 1000000 div z"))
        .withColumn("epochs_ppm",
          expr("w_ppm * 1000000 div greatest(p_ppm, CAST(1 AS BIGINT))"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("p_ppm"), col("pw_e6"), col("w_ppm"), col("epochs_ppm"))
        .orderBy(col("source"))
    }),

    // LSH PARAMETER PLANNER — the design-time tool every banded-
    // MinHash deployment runs before choosing (bands, rows): for each
    // factorization b·r = 128, the S-curve collision probability
    // P(s) = 1 − (1 − s^r)^b at two operating points, the implied
    // threshold (1/b)^(1/r), and the cost = false-positive mass at
    // s_low + false-negative mass at s_high. The operating points are
    // MEASURED, not assumed: s_high is the mean 3-gram Jaccard of the
    // planted truncation near-dups (the x02 corpus construction) over
    // a bounded 50-pair probe, s_low is half of it — so the planner
    // prices the corpus's own duplicate geometry. Every pow rides the
    // round(·,6)·1e6 lift; fractional exponents are double division
    // of columns, never decimal literals (the x102 trap). Scale
    // shape: the probe is a 50-row equi-join on doc_id (native
    // intersect-size per pair); the grid is EXACTLY 8 rows at any
    // corpus size — its rank window is the bounded-domain class.
    "x115_lsh_planner" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 50)
        .withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= 6)
      def shingles(c: Column): Column = array_distinct(c)
      val base = docs.select(col("doc_id"),
        shingles(Text.wordShingles(col("t"), 3)).as("sa"))
      val trunc = docs.select(col("doc_id"),
        shingles(Text.wordShingles(expr(
          "slice(t, 1, greatest(size(t) - 3, 0))"), 3)).as("sb"))
        .filter(size(col("sb")) > 0)
      val probe = base.join(trunc, "doc_id")
        .withColumn("inter",
          graft.ext.Dedup.intersectSize(col("sa"), col("sb")).cast("long"))
        .withColumn("jac_ppm", expr(
          "inter * 1000000 div (size(sa) + size(sb) - inter)"))
        .agg(sum(col("jac_ppm")).as("jsum"), count(lit(1)).as("n_pairs"))
        .withColumn("s_high_ppm", expr("jsum div n_pairs"))
        .withColumn("s_low_ppm", expr("(jsum div n_pairs) div 2"))
        .select(col("n_pairs"), col("s_high_ppm"), col("s_low_ppm"))
      def pCollide(sPpm: Column, r: Column, b: Column): Column = {
        val a = round(pow(sPpm.cast("double") / 1e6, r.cast("double")), 6)
        lit(1000000L) - round(round(
          pow(lit(1.0) - a, b.cast("double")), 6) * 1e6).cast("long")
      }
      val grid = s.range(8)
        .select(expr("shiftleft(CAST(1 AS BIGINT), CAST(id AS INT))")
          .as("r"))
        .withColumn("b", expr("128 div r"))
      val scored = grid.crossJoin(broadcast(probe))
        .withColumn("t_e6", round(round(
          pow(lit(1.0) / col("b").cast("double"),
            lit(1.0) / col("r").cast("double")), 6) * 1e6).cast("long"))
        .withColumn("p_low_e6", pCollide(col("s_low_ppm"), col("r"), col("b")))
        .withColumn("p_high_e6", pCollide(col("s_high_ppm"), col("r"), col("b")))
        .withColumn("cost_e6",
          col("p_low_e6") + (lit(1000000L) - col("p_high_e6")))
      scored
        .withColumn("rk", row_number().over(
          Window.orderBy(col("cost_e6"), col("r"))))
        .withColumn("is_best", col("rk") === 1)
        .select(col("r"), col("b"), col("s_low_ppm"), col("s_high_ppm"),
          col("t_e6"), col("p_low_e6"), col("p_high_e6"), col("cost_e6"),
          col("is_best"))
        .orderBy(col("r"))
    }),

    // VOCABULARY COVERAGE CURVE — the tokenizer-design number: the
    // smallest vocabulary (most-frequent types first) covering 50 /
    // 90 / 95 / 99% of the corpus token MASS. One vocabulary-bounded
    // frequency agg (map-side combined — the x101/x96 type-table
    // posture), a rank + running-mass window over the TYPE table
    // (vocab-bounded: distinct types plateau by Heaps' law and are
    // ≤ sqrt(2N) for N total tokens — the x69 adjudication), then
    // each target percent picks its crossing row WITHOUT an argmin:
    // the unique row where the running mass first reaches the target
    // (prev = cum − cnt still below). Output is 4 rows at any corpus
    // size.
    "x116_vocab_coverage" -> ((s, dir) => {
      val freq = spread(t(s, dir, "documents"))
        .select(explode(Text.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val wR = Window.orderBy(col("cnt").desc, col("tok"))
      val ranked = freq
        .withColumn("rnk", row_number().over(wR).cast("long"))
        .withColumn("cum", sum(col("cnt")).over(
          wR.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val tot = freq.agg(sum(col("cnt")).as("total"))
      val pcts = s.range(4).select(
        expr("element_at(array(50, 90, 95, 99), CAST(id AS INT) + 1)")
          .cast("long").as("pct"))
      ranked.crossJoin(broadcast(tot)).crossJoin(broadcast(pcts))
        .filter(col("cum") * 100 >= col("pct") * col("total") &&
          (col("cum") - col("cnt")) * 100 < col("pct") * col("total"))
        .select(col("pct"), col("rnk").as("vocab_size"),
          col("cum").as("tokens_covered"),
          expr("cum * 1000000 div total").as("coverage_ppm"))
        .orderBy(col("pct"))
    }),

    // EPOCH-CAPPED MIXTURE ALLOCATION — x114's temperature weights
    // under the production constraint every data recipe ships with
    // (the Llama-class "repeat no source more than E_max epochs"):
    // water-filling, determinized as a FIXED 4-round unroll (both
    // engines run the same rounds whether or not a round moves
    // anything — the x106 unrolled-MM discipline). Each round: the
    // un-capped sources split the remaining budget ∝ their √p
    // weights (exact integer div); any source whose tentative
    // allocation reaches its cap (2 epochs × its own tokens) freezes
    // AT the cap and its surplus re-flows next round. Temperature
    // upweights the TAIL, so caps bind on the smallest sources first
    // — exactly the failure mode the cap exists for. The driver
    // corpus is near-uniform across sources (nothing would cap), so
    // the demo PLANTS a 1–5× source-mass skew (weight = 1 + src_n%5,
    // the dedup-demo planted-construction discipline, reproduced in
    // the oracle): rounds 1 AND 2 both cap sources and the re-flow
    // cascade is exercised, not just compiled (RoundTwelveCSpec pins
    // the two-wave capping). Budget = 1.5× corpus tokens. Scale
    // shape: the corpus is touched ONCE (the x114 sources-bounded
    // agg, localCheckpointed); all four rounds ride the ~20-row spine
    // with 1-row broadcast aggregates — the bounded-BNLJ class.
    "x117_capped_mixing" -> ((s, dir) => {
      val stats = spread(t(s, dir, "documents"))
        .withColumn("n_toks", size(Text.tokens(col("text"))).cast("long")
          * (lit(1L) + expr("CAST(substring(source, 4) AS BIGINT) % 5")))
        .groupBy(col("source"))
        .agg(sum(col("n_toks")).as("n_tokens"))
        .localCheckpoint() // sources-bounded spine, read every round
      val tot = stats.agg(sum(col("n_tokens")).as("total"))
      val base = stats.crossJoin(broadcast(tot))
        .withColumn("p_ppm", expr("n_tokens * 1000000 div total"))
        .withColumn("pw_e6",
          round(round(pow(col("p_ppm").cast("double") / 1e6, 0.5), 6)
            * 1e6).cast("long"))
        .withColumn("cap_tokens", col("n_tokens") * 2L)
        .withColumn("budget", expr("(total * 3) div 2"))
        .select(col("source"), col("n_tokens"), col("pw_e6"),
          col("cap_tokens"), col("budget"))
      val r0 = base.withColumn("capped", lit(false))
        .withColumn("alloc_tokens", lit(0L))
      val rFinal = (1 to 4).foldLeft(r0) { (prev, _) =>
        val sums = prev.agg(
          coalesce(sum(when(col("capped"), col("cap_tokens"))), lit(0L))
            .as("capsum"),
          greatest(coalesce(
            sum(when(!col("capped"), col("pw_e6"))), lit(0L)), lit(1L))
            .as("zsum"))
        prev.crossJoin(broadcast(sums))
          .withColumn("tent", when(col("capped"), lit(0L)).otherwise(
            expr("(pw_e6 * (budget - capsum)) div zsum")))
          .withColumn("capped2",
            col("capped") || col("tent") >= col("cap_tokens"))
          .select(col("source"), col("n_tokens"), col("pw_e6"),
            col("cap_tokens"), col("budget"),
            col("capped2").as("capped"),
            when(col("capped2"), col("cap_tokens")).otherwise(col("tent"))
              .as("alloc_tokens"))
      }
      rFinal
        .withColumn("epochs_ppm",
          expr("alloc_tokens * 1000000 div n_tokens"))
        .select(col("source"), col("n_tokens"), col("pw_e6"),
          col("cap_tokens"), col("alloc_tokens"), col("epochs_ppm"),
          col("capped"))
        .orderBy(col("source"))
    }),

    // WITHIN-DOCUMENT REPETITION SURGERY — x65's span removal turned
    // INWARD (the Gopher-rule follow-through: x71 flags self-repeating
    // docs, this op repairs them): every ≥w-token window that already
    // occurred EARLIER in the same document is marked (first
    // occurrence survives by the min-idx rule), marked offsets merge
    // into islands, islands become cover intervals, covered tokens
    // drop, the doc is rebuilt and fingerprinted. Corpus plants the
    // echo pathology cleaning exists for: copies (id+10000) re-append
    // their own opening 12 tokens — the trailing-boilerplate echo —
    // and surgery must return them to EXACTLY their source's cleaned
    // form (RoundTwelveCSpec pins clean_md5 equality per pair).
    // Scale shape: x65's — narrow window hashing, the first-occurrence
    // rule and islands ride ONE (doc_id)-keyed exchange (the (doc,h)
    // min and the island row_number share the doc hash partitioning),
    // per-doc interval lists bounded by the doc's own island count,
    // rebuild a narrow HOF filter.
    "x118_self_repetition" -> ((s, dir) => {
      val w = 8
      val docs = t(s, dir, "documents")
      val toks = Text.tokens(col("text"))
      val echoed = docs.select((col("doc_id") + 10000L).as("doc_id"),
        concat(col("text"), lit(" "),
          array_join(slice(toks, 1, 12), " ")).as("text"))
      val corpus = spread(
        docs.select(col("doc_id"), col("text")).unionByName(echoed))
      val wins = corpus
        .withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= w)
        .select(col("doc_id"), posexplode(expr(
          // the window hash is ONLY a grouping key (never output):
          // an 8-byte xxhash64 shuffles ~4x fewer bytes than the
          // md5 hex string at identical grouping (round-16 §2.3)
          s"transform(sequence(0, size(t) - $w)," +
            s" i -> xxhash64(array_join(slice(t, i + 1, $w), ' ')))")))
        .select(col("doc_id"), col("pos").as("idx"), col("col").as("h"))
      val wFirst = Window.partitionBy(col("doc_id"), col("h"))
      val grp = Window.partitionBy(col("doc_id")).orderBy(col("idx"))
      val spans = wins
        .withColumn("first_idx", min(col("idx")).over(wFirst))
        .filter(col("idx") > col("first_idx"))
        .withColumn("island", col("idx") - row_number().over(grp))
        .groupBy(col("doc_id"), col("island"))
        .agg(min(col("idx")).as("s"), (max(col("idx")) + (w - 1)).as("e"))
        .groupBy(col("doc_id"))
        .agg(collect_list(struct(col("s"), col("e"))).as("spans"))
      corpus.join(spans, Seq("doc_id"), "left")
        .withColumn("t", Text.tokens(col("text")))
        .withColumn("kept", expr(
          "filter(t, (tok, i) -> spans IS NULL OR" +
            " NOT exists(spans, sp -> i >= sp.s AND i <= sp.e))"))
        .select(col("doc_id"),
          size(col("t")).cast("long").as("n_tokens"),
          (size(col("t")) - size(col("kept"))).cast("long").as("n_removed"),
          md5(array_join(col("kept"), " ")).as("clean_md5"))
        .orderBy(col("doc_id"))
    }),

    // CURRICULUM INTERLEAVE — training-order construction: rank the
    // corpus by quality (the x102 distinct-token metric), cut into
    // deciles, and emit the ROUND-ROBIN order (one doc from each
    // decile in rotation) so every training window sees the full
    // quality distribution — the anti-clustering ordering data-order
    // ablations call for, as pure arithmetic on the global rank:
    // decile = ((rnk−1)·10) div N, within-decile position = rnk minus
    // the decile's start, curriculum position = (wrank−1)·10+decile
    // (injective by construction — no second ranking pass). Rank
    // rides [[bucketedRank]]: the only unpartitioned window is the
    // ≤245-row bucket-offset table. Scale shape: one tokenize+project,
    // one bucket-keyed rank exchange, then narrow arithmetic.
    "x119_curriculum_interleave" -> ((s, dir) => {
      val scored = spread(t(s, dir, "documents"))
        .withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) > 0)
        .withColumn("score_ppm",
          expr("CAST(size(array_distinct(t)) AS BIGINT) * 1000000" +
            " div CAST(size(t) AS BIGINT)"))
        .select(col("doc_id"), col("score_ppm"))
        .localCheckpoint() // 2-col longs; read by offsets + join + n —
      // without the cut each consumer re-tokenizes the corpus
      val n = scored.agg(count(lit(1)).as("n_total"))
      bucketedRank(scored, "score_ppm", "rnk")
        .crossJoin(broadcast(n))
        .withColumn("decile", expr("((rnk - 1) * 10) div n_total"))
        .withColumn("wrank", expr("rnk - (decile * n_total) div 10"))
        .withColumn("pos", expr("(wrank - 1) * 10 + decile"))
        .select(col("doc_id"), col("score_ppm"), col("rnk"),
          col("decile"), col("wrank"), col("pos"))
        .orderBy(col("pos"))
    }),

    // QUALITY-SIGNAL RANK BLEND — the classifier-ensemble trick
    // (combine heterogeneous quality signals on the RANK scale, where
    // their incomparable units cancel): three deterministic signals —
    // type-token ratio, stopword ratio, capped chars-per-token — each
    // percentile-ranked by the x86/x91 two-level law, blended as the
    // integer mean of the three rank-ppms, gated at the median. The
    // offset half of all three ranks is ONE bounded aggregate
    // (signals are value-bounded ppm → ≤245 buckets each, ≤735 rows
    // total) COLLECTED into literal maps — the StreamNb frozen-
    // literal discipline, bounded driver state — so each per-doc rank
    // is a keyed bucket window plus a map lookup: no offset broadcast
    // joins, no n_total job (N is the offsets' own sum). A/B'd at
    // sf1: the three-fold bucketedRank form with broadcast-join
    // offsets ran 2.88 s (post-checkpoint; 4.23 s before); this form
    // removes three broadcast builds and the count job. Signal
    // DIRECTIONS are conventions stated here: higher ttr, higher
    // stopword share and longer words all rank upward — the blend
    // demotes docs only when signals agree.
    "x120_quality_rank_blend" -> ((s, dir) => {
      val scored = spread(t(s, dir, "documents"))
        .withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) > 0)
        .withColumn("ttr_ppm",
          expr("CAST(size(array_distinct(t)) AS BIGINT) * 1000000" +
            " div CAST(size(t) AS BIGINT)"))
        .withColumn("__sc", Text.stopwordCount(col("t")).cast("long"))
        .withColumn("stop_ppm", // integer div, not Column./ (double)
          expr("__sc * 1000000 div CAST(size(t) AS BIGINT)"))
        .withColumn("wlen_ppm",
          least(expr("n_chars * 1000000 div" +
            " (CAST(size(t) AS BIGINT) * 16)"), lit(1000000L)))
        .select(col("doc_id"), col("ttr_ppm"), col("stop_ppm"),
          col("wlen_ppm"))
        .localCheckpoint() // 4-col longs; read by the offsets agg and
      // the rank pass — without the cut each re-tokenizes the corpus
      val sigs = Seq("ttr_ppm" -> "r1", "stop_ppm" -> "r2",
        "wlen_ppm" -> "r3")
      val offRows = scored.select(explode(array(sigs.map {
          case (sc, rk) => struct(lit(rk).as("sig"),
            expr(s"$sc div 4096").as("b"))
        }: _*)).as("x"))
        .groupBy(col("x.sig").as("sig"), col("x.b").as("b"))
        .agg(count(lit(1)).as("cnt"))
        .collect() // bounded: ≤245 buckets × 3 signals
      val nTotal = offRows.filter(_.getString(0) == "r1")
        .map(_.getLong(2)).sum
      def offMap(rk: String): Column = {
        val sorted = offRows.filter(_.getString(0) == rk)
          .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
        val cum = sorted.map(_._2).scanLeft(0L)(_ + _).init
        typedlit(sorted.map(_._1).zip(cum).toMap)
      }
      val ranked = sigs.foldLeft(scored) { case (df, (sc, rk)) =>
        val wB = Window.partitionBy(expr(s"$sc div 4096"))
          .orderBy(col(sc), col("doc_id"))
        df.withColumn(rk,
          element_at(offMap(rk), expr(s"$sc div 4096"))
            + row_number().over(wB).cast("long"))
      }
      def rPpm(rk: String): String =
        s"(($rk - 1) * 1000000 div ${math.max(nTotal - 1, 1)}L)"
      ranked
        .withColumn("blend_ppm", expr(
          s"(${rPpm("r1")} + ${rPpm("r2")} + ${rPpm("r3")}) div 3"))
        .withColumn("keep", col("blend_ppm") >= 500000L)
        .select(col("doc_id"), col("ttr_ppm"), col("stop_ppm"),
          col("wlen_ppm"), col("r1"), col("r2"), col("r3"),
          col("blend_ppm"), col("keep"))
        // NOT checkpointed before the sort: the checkpoint-before-sort
        // lever was A/B'd in r14 (fresh-JVM min-of-3/4 at sf1: 2.72 s
        // without vs 2.55 s with — flat within this host's ±40% rep
        // noise) because AQE already reuses the three rank windows'
        // shuffle stages for the range sampler; the extra job buys
        // nothing measurable, so the plainer form stays
        .orderBy(col("doc_id"))
    }),

    // RAG OVERLAP CHUNKING — the retrieval-corpus prep step: cut each
    // document into fixed-size token windows (32) at a fixed stride
    // (24, i.e. 8-token overlap) so no retrievable span straddles a
    // boundary unseen; chunk count = ceil((n−c)/s)+1 with short docs
    // one whole chunk. The ceil rides non-negative integer div ONLY
    // (the n≤c guard keeps the dividend positive — Spark's div
    // truncates toward zero while DuckDB's // floors, and they
    // disagree exactly on negatives). Each chunk carries its offset,
    // exact length (arithmetic, not a re-split) and content md5 —
    // the downstream x90/x94 unit. Scale shape: one narrow
    // tokenize+explode, output ~n/s rows per n-token doc, no shuffle
    // at all past the scan.
    "x121_rag_chunks" -> ((s, dir) => {
      val c = 32; val st = 24
      spread(t(s, dir, "documents"))
        .withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) > 0)
        .withColumn("n", size(col("t")).cast("long"))
        .select(col("doc_id"), col("n"), posexplode(expr(
          s"transform(sequence(CAST(0 AS BIGINT), CASE WHEN n <= $c " +
            s"THEN CAST(0 AS BIGINT) ELSE (n - $c + $st - 1) div $st " +
            s"END), i -> md5(array_join(slice(t, CAST(i * $st + 1 " +
            s"AS INT), $c), ' ')))")))
        .select(col("doc_id"), col("n").as("n_tokens"),
          col("pos").cast("long").as("chunk_idx"),
          (col("pos") * st).cast("long").as("start_tok"),
          least(lit(c.toLong), col("n") - col("pos") * st).as("chunk_len"),
          col("col").as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // SPLIT-STRATEGY LEAKAGE COMPARATOR — closes the loop x38/x39
    // leave open: x38 MEASURES the naive hash split's leak and x39
    // SHIPS the component split, but nothing prices the strategies
    // against each other on the same discovered-pair set. This audit
    // does, three ways, on the x02 banded-MinHash pairs (verified at
    // Jaccard ≥ 0.5): (a) NAIVE per-document hash split — leaks
    // ~2·p·(1−p) of dup pairs (a near-copy of a training doc lands in
    // test); (b) SOURCE-GROUP split (hash the known source id) —
    // fixes the PLANTED copies but still leaks on discovered
    // cross-source near-dups, the failure mode "group by provenance"
    // silently carries; (c) COMPONENT split (hash the pair-graph
    // component label, x39's machinery) — zero BY CONSTRUCTION, and
    // the audit MEASURES the zero instead of assuming it. Scale
    // shape: the x02 candidate machinery (band-key equi-join, never
    // all-pairs), pairs localCheckpointed (read by the component
    // propagation AND the audit), component labels a bounded-round
    // min-propagation, final output 3 rows.
    "x122_split_leakage" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = Text.tokens(col("text"))
      val mutated = docs.select(
        (col("doc_id") + 10000).as("doc_id"),
        array_join(slice(toks, lit(1), size(toks) - 3), " ").as("text"))
      val corpus = spread(
        docs.select(col("doc_id"), col("text")).unionByName(mutated))
      val sh = corpus
        .withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), Text.wordShingles(col("t")).as("s"))
      val pairs = Dedup.nearDupPairs(sh, "doc_id", "s",
          numHashes = 12, bands = 4, threshold = 0.5)
        .select(col("id_a"), col("id_b"))
        .localCheckpoint() // pairs-sized; read by components + audit
      val comp = Components.connectedComponents(
        sh.select(col("doc_id")), "doc_id", pairs, "id_a", "id_b")
      def isTest(idExpr: String, tag: String): Column =
        expr(s"CAST(conv(substring(md5(CAST(($idExpr) AS STRING) || " +
          s"'$tag'), 1, 8), 16, 10) AS BIGINT) % 1000000") < 200000L
      val flagged = pairs
        .join(comp.select(col("doc_id").as("id_a"),
          col("cluster_id").as("comp_a")), "id_a")
        .join(comp.select(col("doc_id").as("id_b"),
          col("cluster_id").as("comp_b")), "id_b")
        .withColumn("naive_cross",
          (isTest("id_a", "#spl") =!= isTest("id_b", "#spl"))
            .cast("long"))
        .withColumn("group_cross",
          (isTest("id_a % 10000", "#spl") =!=
            isTest("id_b % 10000", "#spl")).cast("long"))
        .withColumn("comp_cross",
          (isTest("comp_a", "#spl") =!= isTest("comp_b", "#spl"))
            .cast("long"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("naive_cross")).as("naive_leaks"),
          sum(col("group_cross")).as("group_leaks"),
          sum(col("comp_cross")).as("comp_leaks"))
      flagged.select(explode(array(
          struct(lit("component").as("strategy"), col("n_pairs"),
            col("comp_leaks").as("n_cross")),
          struct(lit("group").as("strategy"), col("n_pairs"),
            col("group_leaks").as("n_cross")),
          struct(lit("naive").as("strategy"), col("n_pairs"),
            col("naive_leaks").as("n_cross")))).as("x"))
        .select(col("x.strategy"), col("x.n_pairs"), col("x.n_cross"))
        .withColumn("leak_ppm",
          expr("n_cross * 1000000 div greatest(n_pairs, CAST(1 AS BIGINT))"))
        .orderBy(col("strategy"))
    }),

    // SESSION ACTION-TRANSITION MATRIX — agent-trajectory statistics:
    // sessionize the event log (x13's 30-minute rule), read each
    // session as an action sequence, and aggregate the first-order
    // Markov transition matrix with an explicit END state (the
    // session's last action transitions to END — absorbing state, so
    // every row's outgoing mass is complete). Probabilities are
    // Laplace-smoothed exact-integer ppm: p = (c+1)·1e6 div
    // (row_total + V+1), V+1 = observed action types + END — the
    // denominator every unseen transition would need, derived from
    // the data, not assumed. The trajectory-modeling prep step for
    // agent/behavioral training data. Scale shape: ONE user-keyed
    // exchange carries sessionize AND the lead() (same partitioning),
    // then a types²-bounded agg (map-side combined) and a V-sized
    // broadcast spine — output ≤ V·(V+1) rows at any log size.
    "x123_action_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val ms = RelationalQueries.epochMs(col("ts"))
      val sess = spread(t(s, dir, "events"))
        .withColumn("prev_ms", lag(ms, 1).over(w))
        .withColumn("brk",
          when(col("prev_ms").isNull || ms - col("prev_ms") > 1800000L,
            1L).otherwise(0L))
        .withColumn("session_id", sum(col("brk")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val wS = Window.partitionBy(col("user_id"), col("session_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = sess
        .withColumn("to_type",
          coalesce(lead(col("event_type"), 1).over(wS), lit("END")))
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val v = trans.agg(
        count_distinct(col("from_type")).as("v")) // observed actions
      val rowTot = trans.groupBy(col("from_type"))
        .agg(sum(col("n")).as("row_total"))
      trans.join(rowTot, "from_type").crossJoin(broadcast(v))
        .withColumn("p_ppm",
          expr("(n + 1) * 1000000 div (row_total + v + 1)"))
        .select(col("from_type"), col("to_type"), col("n"),
          col("row_total"), col("p_ppm"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // The DEPTH form of the BPE fast trainer — the deployment shape
    // the x96 demo's floor adjudication points at (round-12 verdict
    // task 2): 16 merge rounds of incremental pair-count maintenance
    // (per-round cost bounded by the TYPE table and flat in depth —
    // SCALE-BPEFAST), then the single-expression NATIVE encode of the
    // full corpus under the frozen 16-rule vocabulary (one expression
    // regardless of rule count — SCALE-BPENATIVE). The oracle pays
    // the honest alternative at the same depth: a 16-round full
    // RECOUNT loop re-deriving every pair count from the rewritten
    // training corpus each round, whose per-round cost grows with the
    // corpus while the fast loop never re-touches it. x85/x96 keep
    // their toy-depth demos; this entry is their adjudication anchor
    // (16 rounds amortize the fixed per-round scheduling floor those
    // demos pay at depth 3-4).
    "x124_bpe_depth_train" -> ((s, dir) => {
      import graft.ext.BpeMerge
      val docs = spread(t(s, dir, "documents"))
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
        .localCheckpoint() // tokenize ONCE: train slice + encode input
      val rules = BpeMerge.collectRules(BpeMerge.trainFast(
        BpeMerge.typeTable(
          docs.filter(col("doc_id") % 10 === 0).select(col("toks"))),
        rounds = 16))
      BpeMerge.encodeNative(docs, rules)
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          md5(array_join(col("toks"), " ")).as("tokens_md5"))
        // narrow from the scan — materialize the 3-column fingerprints
        // before the output sort's range sampler (the x85 finding)
        .localCheckpoint()
        .orderBy(col("doc_id"))
    }),

    // FILL-IN-THE-MIDDLE transform (Bavarian et al. 2022) — the code/
    // infilling data-prep op: half the corpus (md5-coin, docs with ≥4
    // tokens) is rewritten PSM-style as <PRE> prefix <SUF> suffix
    // <MID> middle with two md5-seeded cut points; the rest stays
    // autoregressive. Everything is a pure narrow map (the FIM paper's
    // point: it's a data transform, not a model change); cut points
    // and the coin are exact integer md5 draws so the rendered text
    // md5 hash-proves the SPLIT itself cross-engine.
    "x125_fim_transform" -> ((s, dir) => {
      def u(tag: String) = expr("CAST(conv(substring(md5(CAST(doc_id " +
        s"AS STRING) || '$tag'), 1, 8), 16, 10) AS BIGINT)")
      def join4(sl: Column) = array_join(sl, " ")
      spread(t(s, dir, "documents"))
        .withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) > 0)
        .withColumn("n", size(col("t")).cast("long"))
        .withColumn("fim", col("n") >= 4L && pmod(u("#fim?"), lit(2L)) === 0L)
        .withColumn("c1", pmod(u("#fimc1"), col("n") + 1L))
        .withColumn("c2", pmod(u("#fimc2"), col("n") + 1L))
        .withColumn("cut_a", least(col("c1"), col("c2")))
        .withColumn("cut_b", greatest(col("c1"), col("c2")))
        .withColumn("rendered", when(col("fim"), concat(
          lit("<PRE> "),
          join4(slice(col("t"), lit(1), col("cut_a").cast("int"))),
          lit(" <SUF> "),
          join4(slice(col("t"), (col("cut_b") + 1L).cast("int"),
            (col("n") - col("cut_b")).cast("int"))),
          lit(" <MID> "),
          join4(slice(col("t"), (col("cut_a") + 1L).cast("int"),
            (col("cut_b") - col("cut_a")).cast("int")))))
          .otherwise(join4(col("t"))))
        .select(col("doc_id"),
          when(col("fim"), "fim").otherwise("ar").as("mode"),
          col("cut_a"), col("cut_b"),
          (col("n") + when(col("fim"), 3L).otherwise(0L)).as("n_tokens"),
          md5(col("rendered")).as("rendered_md5"))
        .orderBy(col("doc_id"))
    }),

    // BITEXT MINING with the margin criterion (Artetxe & Schwenk 2019
    // — the LASER/CCMatrix parallel-corpus construction op): source
    // "language" = even vecs, target pool = odd vecs (distractors) +
    // planted translations (quantized twins of every 4th even vec, the
    // x58 recipe). Candidates come ONLY from the 8-plane sign-LSH
    // bucket equi-join (the x10 shape — never all-pairs); the margin
    // score cos(x,y) / mean(top-4 neighborhood of both sides) is the
    // paper's ratio criterion, computed in exact integer units
    // (floor-e6 cosines, integer-div averages and ratio) so the mined
    // pair set hash-proves. Per source, the rank-1 margin candidate is
    // emitted with a `mined` verdict at ratio ≥ 1.3. At production
    // scale the bucket join swaps for the x87 IVF serve join — same
    // margin arithmetic downstream.
    "x126_bitext_margin" -> ((s, dir) => {
      val e126 = t(s, dir, "embeddings")
      val base = e126.select(col("vec_id"), toD(col("embedding")).as("v"))
      // corpus-proportional code width (round-15, the x10 fix shared
      // here): join corpus = src half + tgt half + planted quarter =
      // 5n/4 rows; ≤ sf1 the ladder resolves to the historical 8
      val nE = e126.count()
      val planes126 = Similarity.planesFor(nE + nE / 4)
      val planted = base.filter(col("vec_id") % 4 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("v"), x => round(x * 1024) / 1024).as("v"))
      val srcB = spread(base.filter(col("vec_id") % 2 === 0))
        .withColumn("bucket", Similarity.signBucket(col("v"), planes126, 64))
        .localCheckpoint()
      val tgtB = spread(base.filter(col("vec_id") % 2 === 1)
        .unionByName(planted))
        .withColumn("bucket", Similarity.signBucket(col("v"), planes126, 64))
        .localCheckpoint()
      val cand = srcB.as("a")
        .join(tgtB.as("b"), col("a.bucket") === col("b.bucket"))
        .select(col("a.vec_id").as("src_id"), col("b.vec_id").as("tgt_id"),
          floor(Similarity.cosine(col("a.v"), col("b.v")) * 1000000 + 0.5)
            .cast("long").as("cos_e6"))
        .localCheckpoint() // read 3×: src top-4, tgt top-4, scoring
      val wS = Window.partitionBy(col("src_id"))
        .orderBy(col("cos_e6").desc, col("tgt_id"))
      val wT = Window.partitionBy(col("tgt_id"))
        .orderBy(col("cos_e6").desc, col("src_id"))
      // margins ride the SHIFTED similarity sim = cos + 1 ∈ [0, 2]:
      // raw cosines go negative, and a near-zero/negative top-4 mean
      // makes the ratio explode or flip sign (measured: margins to
      // ±1e11 on this corpus) — the shift is monotone, keeps the
      // denominator positive, and leaves the criterion's ordering
      // intact. A twin alone in its bucket has margin EXACTLY 1.0
      // (its neighborhood IS the pair) — the known recall limit of
      // single-probe LSH mining; the mined flag is the
      // high-precision subset (0 distractors at 1.2, measured at
      // three SFs), not total recall.
      val aS = cand.withColumn("r", row_number().over(wS))
        .filter(col("r") <= 4).groupBy(col("src_id"))
        .agg(expr("sum(cos_e6 + 1000000) div count(1)").as("avg_s"))
      val aT = cand.withColumn("r", row_number().over(wT))
        .filter(col("r") <= 4).groupBy(col("tgt_id"))
        .agg(expr("sum(cos_e6 + 1000000) div count(1)").as("avg_t"))
      val wM = Window.partitionBy(col("src_id"))
        .orderBy(col("margin_ppm").desc, col("tgt_id"))
      cand.join(aS, "src_id").join(aT, "tgt_id")
        .withColumn("margin_ppm",
          expr("(cos_e6 + 1000000) * 2000000 div greatest(avg_s + avg_t, 1)"))
        .withColumn("rnk", row_number().over(wM))
        .filter(col("rnk") === 1)
        .select(col("src_id"), col("tgt_id"), col("cos_e6"),
          col("margin_ppm"),
          (col("margin_ppm") >= 1200000L).as("mined"))
        .orderBy(col("src_id"))
    }),

    // LUHN-VALIDATED PII detection — upgrades x26's pattern matching
    // with the checksum validation real PII scrubbers run: 13-19 digit
    // runs are candidates, but only runs passing the Luhn mod-10 check
    // (ISO/IEC 7812) count as card numbers. The corpus plants a VALID
    // 16-digit number on every 3rd doc (payload from doc_id, check
    // digit computed by the same Luhn arithmetic) and an INVALID one
    // (check digit +1) on every 5th — so the validator must separate
    // them, not just pattern-match. Pure narrow maps: regexp extract +
    // a bounded per-run digit fold; the valid-run md5 pins the exact
    // detected set cross-engine.
    "x127_luhn_pii" -> ((s, dir) => {
      // Luhn sum of the 15-digit payload `p` (left-to-right index i,
      // right-position j = 16 - i + 1 ⇒ double odd i)
      val paySum = "aggregate(sequence(1, 15), CAST(0 AS BIGINT), " +
        "(acc, i) -> acc + CASE WHEN i % 2 = 1 THEN " +
        "IF(2 * CAST(substring(p, i, 1) AS INT) > 9, " +
        "2 * CAST(substring(p, i, 1) AS INT) - 9, " +
        "2 * CAST(substring(p, i, 1) AS INT)) " +
        "ELSE CAST(substring(p, i, 1) AS INT) END)"
      // full-run Luhn validity for a detected run `r` of any length
      val runOk = "aggregate(sequence(1, length(r)), CAST(0 AS BIGINT), " +
        "(acc, i) -> acc + CASE WHEN (length(r) + 1 - i) % 2 = 0 THEN " +
        "IF(2 * CAST(substring(r, i, 1) AS INT) > 9, " +
        "2 * CAST(substring(r, i, 1) AS INT) - 9, " +
        "2 * CAST(substring(r, i, 1) AS INT)) " +
        "ELSE CAST(substring(r, i, 1) AS INT) END) % 10 = 0"
      spread(t(s, dir, "documents"))
        .withColumn("p", expr("lpad(CAST(pmod(doc_id * 7919 + " +
          "123456789, 1000000000000000) AS STRING), 15, '0')"))
        .withColumn("chk", expr(s"pmod(10 - pmod($paySum, 10), 10)"))
        .withColumn("pii_text", concat(col("text"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit(" card "), col("p"), col("chk").cast("string")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5)) === 0,
            concat(lit(" ref "), col("p"),
              pmod(col("chk") + 1, lit(10)).cast("string")))
            .otherwise(lit(""))))
        .withColumn("runs", expr(
          "regexp_extract_all(pii_text, '[0-9]{13,19}', 0)"))
        .withColumn("valid", expr(s"filter(runs, r -> $runOk)"))
        .select(col("doc_id"),
          size(col("runs")).cast("long").as("n_runs"),
          size(col("valid")).cast("long").as("n_valid"),
          md5(concat_ws(",", col("valid"))).as("valid_md5"))
        .orderBy(col("doc_id"))
    }),

    // MATRYOSHKA truncation audit (Kusupati et al. 2022) — prices the
    // retrieval cost of serving truncated embeddings: for 20 query
    // vectors, exact top-10 under the FULL 64-dim cosine vs top-10
    // under the first-16-dims truncation; per query, the overlap and
    // the total rank displacement over common members. Both rankings
    // in the x03 floor-e6 integer units with vec_id tie-breaks; the
    // query set is a bounded broadcast (the adjudicated x03 class) and
    // ranking is a query-keyed window — corpus work is linear.
    "x128_matryoshka_eval" -> ((s, dir) => {
      val base = spread(t(s, dir, "embeddings"))
        .select(col("vec_id"), toD(col("embedding")).as("v"))
        .localCheckpoint()
      val q = base.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val scored = base.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          floor(Similarity.cosine(col("qv"), col("v")) * 1000000 + 0.5)
            .cast("long").as("full_e6"),
          floor(Similarity.cosine(slice(col("qv"), 1, 16),
            slice(col("v"), 1, 16)) * 1000000 + 0.5)
            .cast("long").as("low_e6"))
        .localCheckpoint() // read by both rankings
      def top10(scoreCol: String, rankName: String) = scored
        .withColumn(rankName, row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col(scoreCol).desc, col("vec_id"))).cast("long"))
        .filter(col(rankName) <= 10)
        .select(col("query_id"), col("vec_id"), col(rankName))
      top10("full_e6", "rf").join(top10("low_e6", "rl"),
          Seq("query_id", "vec_id"))
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("overlap10"),
          sum(abs(col("rf") - col("rl"))).as("displacement"))
        .orderBy(col("query_id"))
    }),

    // POISSON-BOOTSTRAP confidence band for a corpus statistic — the
    // eval-infra op behind every "± x" on a dataset card, determinized:
    // 16 bootstrap replicas where each doc's replica weight is a
    // Poisson(1) draw read off the md5-seeded inverse CDF (cumulative
    // thresholds in exact ppm — fixed design constants, identical in
    // both engines), replica statistic = weighted mean tokens/doc in
    // integer ppm. The replica SPREAD is the confidence band; the rank
    // column makes the quantile read-off part of the hashed output.
    // One narrow 16-way fan-out + a 16-group aggregate (map-side
    // combined) — corpus touched once at any scale.
    "x129_poisson_bootstrap" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
        .select(col("doc_id"),
          size(Text.tokens(col("text"))).cast("long").as("x"))
      val reps = docs.select(col("doc_id"), col("x"),
        explode(sequence(lit(0L), lit(15L))).as("b"))
        .withColumn("u", expr("CAST(conv(substring(md5(CAST(doc_id AS " +
          "STRING) || '#boot' || CAST(b AS STRING)), 1, 8), 16, 10) " +
          "AS BIGINT) % 1000000"))
        // Poisson(1) inverse CDF, cumulative ppm: P(≤0)=.3679,
        // ≤1=.7358, ≤2=.9197, ≤3=.9810, ≤4=.9963, else 5
        .withColumn("w", when(col("u") < 367879L, 0L)
          .when(col("u") < 735759L, 1L)
          .when(col("u") < 919699L, 2L)
          .when(col("u") < 981012L, 3L)
          .when(col("u") < 996340L, 4L)
          .otherwise(5L))
      val means = reps.groupBy(col("b"))
        .agg(sum(col("w")).as("n_eff"),
          expr("sum(w * x) * 1000000 div greatest(sum(w), 1)")
            .as("mean_ppm"))
      means.withColumn("rnk", row_number().over(
          Window.orderBy(col("mean_ppm"), col("b"))).cast("long"))
        .select(col("b"), col("n_eff"), col("mean_ppm"), col("rnk"))
        .orderBy(col("b"))
    }),

    // HEAPS'-LAW FIT — the type-growth scaling law (V ≈ K·N^β), x69's
    // Zipf slope's corpus-growth twin and the number every
    // tokenizer-budget decision reads: 16 cumulative corpus prefixes
    // (by doc_id VALUE against a 1-row min/max broadcast — no global
    // rank window), per prefix the exact token mass and the exact
    // distinct-TYPE count via each type's FIRST doc (one
    // type-bounded aggregate; a type counts in every prefix at
    // or past its first appearance), then the x69 integer
    // least-squares on the quantized-ln points. The type inventory is
    // word TRIGRAMS, not unigrams: the driver corpus draws from a
    // 31-word vocabulary, so the unigram inventory saturates in the
    // first prefix (β = 0 exactly — the Heaps PLATEAU, a real
    // regime but a degenerate fit), while the trigram inventory keeps
    // minting types corpus-wide (4.5k → 16k across sf0.01) the way a
    // natural vocabulary does. β on the 16-point grid is emitted per
    // row so the hash pins the whole curve, not one float.
    "x130_heaps_fit" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
        .withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), col("t"),
          Text.wordShingles(col("t")).as("g"))
        .localCheckpoint() // read by bounds, token mass, first-docs
      val bounds = docs.agg(min(col("doc_id")).as("lo"),
        max(col("doc_id")).as("hi"))
      val bs = bounds.select(explode(sequence(lit(1L), lit(16L))).as("i"),
        col("lo"), col("hi"))
        .withColumn("b", expr("lo + (hi - lo + 1) * i div 16"))
        .select(col("i"), col("b"))
      val tokMass = docs.crossJoin(broadcast(bs))
        .filter(col("doc_id") < col("b"))
        .groupBy(col("i")).agg(sum(size(col("t")).cast("long")).as("cum_tokens"))
      val firsts = docs.select(col("doc_id"), explode(col("g")).as("w"))
        .groupBy(col("w")).agg(min(col("doc_id")).as("first_doc"))
      val types = firsts.crossJoin(broadcast(bs))
        .filter(col("first_doc") < col("b"))
        .groupBy(col("i")).agg(count(lit(1)).as("cum_types"))
      val pts = tokMass.join(types, "i")
        .withColumn("x6", expr("CAST(round(round(ln(CAST(cum_tokens AS " +
          "DOUBLE)), 6) * 1e6) AS BIGINT)"))
        .withColumn("y6", expr("CAST(round(round(ln(CAST(cum_types AS " +
          "DOUBLE)), 6) * 1e6) AS BIGINT)"))
        .localCheckpoint() // 16 rows: read by the fit and the output
      val fit = pts.agg(
        count(lit(1)).as("n"),
        sum(col("x6").cast("decimal(38,0)")).as("sx"),
        sum(col("y6").cast("decimal(38,0)")).as("sy"),
        sum((col("x6") * col("y6")).cast("decimal(38,0)")).as("sxy"),
        sum((col("x6") * col("x6")).cast("decimal(38,0)")).as("sxx"))
        .select(round((col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double")
          / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"),
          4).as("heaps_beta"))
      pts.crossJoin(broadcast(fit))
        .select(col("i"), col("cum_tokens"), col("cum_types"),
          col("heaps_beta"))
        .orderBy(col("i"))
    }),

    // SFT CHAT RENDERING with LOSS-MASK SPANS — the step that turns
    // interaction logs into supervised training examples: sessions
    // (x13's 30-minute rule) render as alternating
    // `<|user|>`/`<|assistant|>` turns, and each assistant PAYLOAD's
    // exact character span [start, end) is emitted so the trainer can
    // mask the loss to assistant tokens only. Offsets ride a
    // session-keyed cumulative length window (exact integer); the
    // rendered text md5 AND the span-list md5 pin both the template
    // and the mask arithmetic cross-engine. Everything is user/
    // session-keyed — one exchange carries sessionize, ordering and
    // the cumsum.
    "x131_sft_render" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val ms = RelationalQueries.epochMs(col("ts"))
      val sess = spread(t(s, dir, "events"))
        .withColumn("prev_ms", lag(ms, 1).over(w))
        .withColumn("brk",
          when(col("prev_ms").isNull || ms - col("prev_ms") > 1800000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("brk")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val wS = Window.partitionBy(col("user_id"), col("session_id"))
        .orderBy(col("ts"), col("event_id"))
      val turns = sess
        .withColumn("rn", row_number().over(wS).cast("long"))
        .withColumn("tag", when(pmod(col("rn"), lit(2L)) === 1L,
          "<|user|> ").otherwise("<|assistant|> "))
        .withColumn("piece",
          concat(col("tag"), col("event_type"), lit("\n")))
        .withColumn("off", coalesce(sum(length(col("piece")).cast("long"))
          .over(wS.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("span", when(pmod(col("rn"), lit(2L)) === 0L,
          concat(
            (col("off") + length(col("tag"))).cast("string"), lit(":"),
            (col("off") + length(col("piece")) - 1L).cast("string"))))
      turns.groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_turns"),
          sum(when(pmod(col("rn"), lit(2L)) === 0L,
            length(col("event_type")).cast("long")).otherwise(0L))
            .as("masked_chars"),
          md5(concat_ws("", expr(
            "transform(array_sort(collect_list(struct(rn, piece))), " +
              "p -> p.piece)"))).as("rendered_md5"),
          md5(concat_ws(",", expr(
            "transform(array_sort(collect_list(CASE WHEN span IS NOT " +
              "NULL THEN struct(rn, span) END)), p -> p.span)")))
            .as("spans_md5"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // HTML MAIN-CONTENT EXTRACTION (r14 verdict task #2 — the
    // trafilatura-class head of a real pretraining pipeline, and the
    // biggest capability gap the r14 judge named): documents re-render
    // as deterministic synthetic pages (ext/Html.synthPage — head,
    // nav, comment, 12-token <p> blocks with anchor-wrapped and
    // anchor-tailed variants, an entity paragraph, a footer; the
    // oracle generates the IDENTICAL string), then the extractor
    // strips script/style/comments/chrome, splits blocks, drops
    // high-link-density blocks by the integer-exact 2·anchor<text
    // rule, decodes entities, collapses whitespace. Every rule is in
    // the RE2∩Java regex subset so the oracle runs the same pipeline;
    // the hash compare pins title, block counts, and the main text's
    // full md5. A narrow map end to end — no shuffle but the output
    // sort.
    "x132_html_extract" -> ((s, dir) => {
      import graft.ext.Html
      val page = spread(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), Text.tokens(col("text")).as("toks"))
        .withColumn("html",
          Html.synthPage(col("doc_id"), col("lang"), col("toks")))
      page
        .withColumn("bl", Html.blocks(col("html")))
        .withColumn("kept", filter(col("bl"), b => Html.keepBlock(b)))
        .withColumn("main", Html.mainFromKept(col("kept")))
        .select(
          col("doc_id"),
          Html.pageTitle(col("html")).as("title"),
          size(col("bl")).cast("long").as("n_blocks"),
          size(col("kept")).cast("long").as("n_kept"),
          length(col("main")).cast("long").as("main_len"),
          md5(col("main")).as("main_md5"),
          substring(col("main"), 1, 64).as("main_head"))
        .orderBy(col("doc_id"))
    }),

    // URL CANONICALIZATION + eTLD+1 HOST STATS (r14 verdict task #7 —
    // the companion of the extraction head): documents derive
    // deterministic synthetic URLs (ext/Url.synthUrl — mixed-case
    // scheme/host, default/non-default ports, trailing slashes,
    // shuffled tracking-polluted params, fragments, multi-label
    // public suffixes; the oracle generates the IDENTICAL string),
    // then canonicalize: lowercase scheme/host, strip default ports,
    // strip trailing slash, drop tracking params, SORT survivors,
    // drop the fragment; eTLD+1 groups hosts by registrable domain
    // against the REAL bundled public-suffix list (round-16 — Psl /
    // PslEtld1; hosts exercise exception, wildcard, and 4-label exact
    // rules). Per-host doc counts ride a KEYED
    // window on the canonical host — the natural crawl partitioning
    // key. Narrow map + one keyed exchange.
    "x133_url_canonical" -> ((s, dir) => {
      import graft.ext.Url
      val u = spread(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("source"))
        .withColumn("url",
          Url.synthUrl(col("doc_id"), col("lang"), col("source")))
        .withColumn("canonical", Url.canonicalize(col("url")))
        .withColumn("host", Url.host(col("url")))
      u.withColumn("n_host_docs",
          count(lit(1)).over(Window.partitionBy(col("host"))).cast("long"))
        .select(col("doc_id"), col("url"), col("canonical"),
          Url.etld1(col("host")).as("etld1"), col("n_host_docs"))
        .orderBy(col("doc_id"))
    }),
  )

  /** Fixed 24-token boilerplate footer for the x98 corpus — the
    * shared-across-every-copy text that weighting must demote.
    */
  val Boilerplate: String =
    "all rights reserved terms of service apply contact us for more " +
      "information subscribe to our newsletter for weekly updates see " +
      "privacy policy and cookie settings"

  // ---------------------------------------------------------------- oracles

  private val stoplistSql = Text.Stopwords.map(w => s"'$w'").mkString(", ")

  private def cosineSql(a: String, b: String): String =
    s"""list_sum([$a[i] * $b[i] for i in range(1, len($a)+1)]) /
       |sqrt(list_sum([x * x for x in $a]) * list_sum([x * x for x in $b]))""".stripMargin

  /** Unrolled k-means IVF oracle mirroring x16's fitQuantized + search
    * (KMeansLite Scaladoc spells out why every step is bit-identical:
    * exact 2^24 quantization, integer sums, floor of an IEEE division,
    * exact reconstruction; argmin and probe ties break to the lowest
    * cell; seeds are the first k vectors in id order).
    */
  private def kmeansIvfSql(
      k: Int, dims: Int, iters: Int,
      nProbe: Int, topK: Int, nQueries: Int): String = {
    def d2(v: String, cv: String): String =
      s"list_sum([($v[i] - $cv[i]) * ($v[i] - $cv[i]) for i in range(1, ${dims + 1})])"
    def assignCte(prev: Int, cur: Int): String =
      s"""a_$cur AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT p.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY p.vec_id
         |                         ORDER BY ${d2("p.v", "c.cv")}, c.cell) AS rn
         |    FROM pts p, c_$prev c)
         |  WHERE rn = 1)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s"""${assignCte(i - 1, i)},
         |m_$i AS (
         |  SELECT a.cell, r.i AS dim,
         |    floor(CAST(sum(p.q[r.i]) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS ms
         |  FROM a_$i a JOIN pts p USING (vec_id), range(1, ${dims + 1}) r(i)
         |  GROUP BY a.cell, r.i),
         |cm_$i AS (
         |  SELECT cell, list(ms / 16777216.0 ORDER BY dim) AS cv
         |  FROM m_$i GROUP BY cell),
         |c_$i AS (
         |  SELECT p.cell, COALESCE(n.cv, p.cv) AS cv
         |  FROM c_${i - 1} p LEFT JOIN cm_$i n USING (cell))""".stripMargin
    }.mkString(",\n")
    s"""WITH pts AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |    [CAST(round(x * 16777216.0) AS BIGINT)
       |     for x in CAST(embedding AS DOUBLE[])] AS q
       |  FROM embeddings),
       |c_0 AS (
       |  SELECT cell, cv FROM (
       |    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
       |    FROM pts)
       |  WHERE cell < $k),
       |$iterCtes,
       |${assignCte(iters, iters + 1)},
       |qd AS (
       |  SELECT query_id, qv, cell FROM (
       |    SELECT q.vec_id AS query_id, q.v AS qv, c.cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |                         ORDER BY ${d2("q.v", "c.cv")}, c.cell) AS cr
       |    FROM pts q, c_$iters c WHERE q.vec_id < $nQueries)
       |  WHERE cr <= $nProbe),
       |corpus AS (
       |  SELECT a.vec_id AS neighbor_id, p.v AS cv, a.cell
       |  FROM a_${iters + 1} a JOIN pts p USING (vec_id)),
       |s AS (
       |  SELECT query_id, neighbor_id,
       |    round(${cosineSql("qv", "cv")}, 6) AS cos6
       |  FROM qd JOIN corpus USING (cell)
       |  WHERE neighbor_id <> query_id),
       |r AS (
       |  SELECT query_id, neighbor_id, cos6,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos6 DESC, neighbor_id) AS BIGINT) AS rnk
       |  FROM s)
       |SELECT query_id, rnk, neighbor_id, round(cos6, 4) AS cosine
       |FROM r WHERE rnk <= $topK
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** Shared by x03 (window rank) and x17 (typed top-k Aggregator). */
  private lazy val bruteForceTopKSql: String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id < 10),
       |c AS (
       |  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
       |  FROM embeddings),
       |s AS (
       |  SELECT query_id, neighbor_id,
       |    floor(${cosineSql("qv", "cv")} * 1000000 + 0.5) AS cos_e6
       |  FROM c, q WHERE neighbor_id <> query_id),
       |r AS (
       |  SELECT query_id, neighbor_id, cos_e6,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos_e6 DESC, neighbor_id) AS BIGINT) AS rnk
       |  FROM s)
       |SELECT query_id, rnk, neighbor_id, floor(cos_e6 / 100 + 0.5) / 10000.0 AS cosine
       |FROM r WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin

  def oracles: Map[String, String] = Map(

    "x01_exact_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text, lang, source, n_chars FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, text, lang, source, n_chars FROM documents),
        |r AS (
        |  SELECT doc_id, lang, source, n_chars,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM corpus)
        |SELECT doc_id, lang, source, n_chars FROM r WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,

    "x02_minhash_pairs" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000,
        |    array_to_string(
        |      (string_split_regex(text, '\s+'))[1:len(string_split_regex(text, '\s+')) - 3],
        |      ' ')
        |  FROM documents),
        |tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM corpus),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                   for i in range(1, len(t) - 1)]) AS s
        |  FROM tok WHERE len(t) >= 3),
        |sig AS (
        |  SELECT doc_id, s,
        |    [list_min([substr(md5(x || '#' || CAST(h // 4 AS VARCHAR)),
        |                      CAST(1 + 8 * (h % 4) AS INT), 8) for x in s])
        |     for h in range(0, 12)] AS g
        |  FROM sh),
        |bands AS (
        |  SELECT doc_id, b, md5(g[3*b+1] || g[3*b+2] || g[3*b+3]) AS bh
        |  FROM sig, range(0, 4) r(b)),
        |cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT doc_a, doc_b,
        |    CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        |      / CAST(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))
        |             AS DOUBLE) AS jac
        |  FROM cand
        |  JOIN sh sa ON sa.doc_id = doc_a
        |  JOIN sh sb ON sb.doc_id = doc_b)
        |SELECT doc_a, doc_b, round(jac, 4) AS jaccard
        |FROM j WHERE jac >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,

    "x03_cosine_topk" -> bruteForceTopKSql,

    // same oracle on purpose: the typed top-k Aggregator must be
    // row-identical to the window-rank formulation
    "x17_topk_agg" -> bruteForceTopKSql,

    "x04_text_stats" ->
      """SELECT lang,
        |  count(*) AS n_docs,
        |  round(avg(n_chars), 2) AS avg_chars,
        |  round(avg(len(string_split_regex(text, '\s+'))), 2) AS avg_tokens,
        |  count(DISTINCT source) AS n_sources
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,

    "x05_lang_id" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, string_split_regex(text, '\\s+') AS toks
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, lang,
         |    CAST(len(list_filter(toks, x -> x IN ($stoplistSql))) AS DOUBLE)
         |      / CAST(len(toks) AS DOUBLE) AS ratio
         |  FROM t)
         |SELECT doc_id, lang, round(ratio, 4) AS stop_ratio,
         |  CASE WHEN ratio >= 0.08 THEN 'en' ELSE 'unk' END AS predicted
         |FROM r ORDER BY doc_id""".stripMargin,

    "x06_quality_score" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split_regex(text, '\\s+') AS toks
         |  FROM documents),
         |r AS (
         |  SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
         |    CAST(list_sum([length(x) for x in toks]) AS DOUBLE) / len(toks) AS mean_tok_len,
         |    CAST(len(list_filter(toks, x -> x IN ($stoplistSql))) AS DOUBLE)
         |      / len(toks) AS stop_ratio
         |  FROM t)
         |SELECT doc_id, n_tokens, round(ttr, 4) AS ttr,
         |  round(mean_tok_len, 4) AS mean_tok_len,
         |  round(stop_ratio, 4) AS stop_ratio,
         |  CAST(floor((0.25 * least(n_tokens / 100.0, 1.0) + 0.5 * ttr
         |              + 0.25 * least(stop_ratio * 5.0, 1.0)) * 10000 + 0.5)
         |       AS BIGINT) AS quality_e4
         |FROM r ORDER BY doc_id""".stripMargin,

    "x07_token_fingerprint" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars, text, string_split_regex(text, '\s+') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\s]')) AS BIGINT) AS re_tokens,
        |  CAST(ceil(CAST(n_chars AS DOUBLE) / 4.0) AS BIGINT) AS est_bpe,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      [CAST((strpos('0123456789abcdef', substr(md5(x), 1, 1)) - 1) * 16
        |            + (strpos('0123456789abcdef', substr(md5(x), 2, 1)) - 1) AS BIGINT)
        |       for x in toks]),
        |    (h, d) -> (h * 31 + d) % 1000000007) AS doc_fp
        |FROM t ORDER BY doc_id""".stripMargin,

    "x08_simhash" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    [md5(x) for x in list_distinct(string_split_regex(text, '\s+'))] AS ms
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(list_sum([CASE WHEN
        |      list_sum([2 * (((strpos('0123456789abcdef',
        |                              substr(m, CAST(b // 4 AS INT) + 1, 1)) - 1)
        |                      // CAST(pow(2, b % 4) AS BIGINT)) % 2) - 1
        |                for m in ms]) > 0
        |    THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END
        |    for b in range(0, 16)]) AS BIGINT) AS simhash
        |FROM t ORDER BY doc_id""".stripMargin,

    "x09_ann_ivf" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, label, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id < 20),
         |c AS (
         |  SELECT vec_id AS neighbor_id, label AS clabel,
         |    CAST(embedding AS DOUBLE[]) AS cv
         |  FROM embeddings),
         |s AS (
         |  SELECT query_id, label, neighbor_id,
         |    round(${cosineSql("qv", "cv")}, 6) AS cos6
         |  FROM q JOIN c ON label = clabel AND neighbor_id <> query_id),
         |r AS (
         |  SELECT query_id, label, neighbor_id, cos6,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |                            ORDER BY cos6 DESC, neighbor_id) AS BIGINT) AS rnk
         |  FROM s)
         |SELECT query_id, label, rnk, neighbor_id, round(cos6, 4) AS cosine
         |FROM r WHERE rnk <= 3
         |ORDER BY query_id, rnk""".stripMargin,

    // bucket width = the same integer step ladder as
    // Similarity.planesFor (8 + Σ[n > 256·2^t]); the per-plane
    // coefficient is the hyperplane FORMULA inline (((i-1)·37 +
    // j·101) mod 13) − 6, identical to Similarity.hyperplane — so the
    // oracle scales its code width with the corpus exactly as the
    // engine does.
    "x10_embed_neardup" ->
      s"""WITH base AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |nn AS (SELECT 2 * count(*) AS n FROM embeddings),
         |par AS (
         |  SELECT CAST(8 + list_sum(
         |    [CASE WHEN n > 256 * (CAST(1 AS BIGINT) << t) THEN 1 ELSE 0 END
         |     for t in range(8, 24)]) AS INT) AS planes
         |  FROM nn),
         |pert AS (
         |  SELECT vec_id + 10000 AS vec_id,
         |    [v[i] * 1.02 + CAST(((i - 1) % 7) - 3 AS DOUBLE) * 0.0001
         |     for i in range(1, len(v)+1)] AS v
         |  FROM base),
         |corpus AS (
         |  SELECT vec_id, v,
         |    CAST(list_sum(
         |      [CASE WHEN list_sum(
         |         [v[i] * ((((i-1)*37 + j*101) % 13) - 6)
         |          for i in range(1, len(v)+1)]) > 0
         |       THEN (CAST(1 AS BIGINT) << j) ELSE 0 END
         |       for j in range(0, planes)]) AS BIGINT) AS bucket
         |  FROM (SELECT * FROM base UNION ALL SELECT * FROM pert), par),
         |cand AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    round(${cosineSql("a.v", "b.v")}, 6) AS cos6
         |  FROM corpus a JOIN corpus b
         |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, round(cos6, 4) AS cosine
         |FROM cand WHERE cos6 >= 0.999
         |ORDER BY id_a, id_b""".stripMargin,

    "x11_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  lower(substr(hex(encode(text)), 1, 16)) AS hex_head,
        |  md5(text) AS content_md5,
        |  CAST(n_chars % 640 AS BIGINT) AS width,
        |  CAST((doc_id * 7) % 480 AS BIGINT) AS height
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "x14_normalized_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text, lang, n_chars FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, upper(text) || '  ', lang, n_chars FROM documents),
        |r AS (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (
        |      PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |      ORDER BY doc_id) AS rn
        |  FROM corpus)
        |SELECT doc_id, lang, n_chars FROM r WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,

    "x13_sessionize_batch" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(epoch_ms(ts)) OVER w AS prev_ms
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |b AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms > 1800000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM g),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS session_id
        |  FROM b)
        |SELECT user_id, session_id,
        |  count(*) AS n_events,
        |  min(ts) AS session_start,
        |  max(ts) AS session_end,
        |  round(sum(value), 2) AS total_value
        |FROM sess
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "x16_ann_kmeans" ->
      kmeansIvfSql(k = 8, dims = 64, iters = 2, nProbe = 2, topK = 3, nQueries = 20),

    "x22_repetition_filter" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
        |base AS (
        |  SELECT doc_id,
        |    CAST(len(t) AS BIGINT) AS n_tokens,
        |    greatest(CAST(len(t) AS BIGINT) - 2, 0) AS n3,
        |    CAST(len(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                            for i in range(1, len(t) - 1)])) AS BIGINT) AS d3
        |  FROM tok),
        |tf AS (
        |  SELECT doc_id, unnest(t) AS token FROM tok),
        |mtf AS (
        |  SELECT doc_id, max(c) AS max_tf FROM (
        |    SELECT doc_id, token, count(*) AS c FROM tf GROUP BY doc_id, token)
        |  GROUP BY doc_id),
        |r AS (
        |  SELECT b.doc_id, b.n_tokens,
        |    CASE WHEN b.n3 = 0 THEN 0.0
        |         ELSE round(1.0 - CAST(b.d3 AS DOUBLE) / CAST(b.n3 AS DOUBLE), 4)
        |    END AS dup3_ratio,
        |    round(CAST(m.max_tf AS DOUBLE) / CAST(b.n_tokens AS DOUBLE), 4)
        |      AS top_tok_ratio
        |  FROM base b JOIN mtf m USING (doc_id))
        |SELECT doc_id, n_tokens, dup3_ratio, top_tok_ratio,
        |  (dup3_ratio <= 0.2 AND top_tok_ratio <= 0.2) AS keep
        |FROM r ORDER BY doc_id""".stripMargin,

    // Same LSH parameters as x02 (12 hashes / 4 bands of 3); the
    // component step is DuckDB's recursive transitive closure — min
    // reachable id per node — which equals min-label-propagation's
    // fixpoint by definition.
    "x23_dedup_clusters" ->
      """WITH RECURSIVE tok0 AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
        |corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000,
        |    array_to_string(t[1:greatest(CAST(floor(len(t) * 0.8) AS INT), 1)], ' ')
        |  FROM tok0 WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id + 20000,
        |    array_to_string(t[1:greatest(CAST(floor(len(t) * 0.55) AS INT), 1)], ' ')
        |  FROM tok0 WHERE doc_id % 4 = 0),
        |tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM corpus),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                   for i in range(1, len(t) - 1)]) AS s
        |  FROM tok WHERE len(t) >= 3),
        |sig AS (
        |  SELECT doc_id, s,
        |    [list_min([substr(md5(x || '#' || CAST(h // 4 AS VARCHAR)),
        |                      CAST(1 + 8 * (h % 4) AS INT), 8) for x in s])
        |     for h in range(0, 12)] AS g
        |  FROM sh),
        |bands AS (
        |  SELECT doc_id, b, md5(g[3*b+1] || g[3*b+2] || g[3*b+3]) AS bh
        |  FROM sig, range(0, 4) r(b)),
        |cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |edges AS (
        |  SELECT doc_a, doc_b
        |  FROM cand
        |  JOIN sh sa ON sa.doc_id = doc_a
        |  JOIN sh sb ON sb.doc_id = doc_b
        |  WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        |      / CAST(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))
        |             AS DOUBLE) >= 0.5),
        |sym AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM edges
        |  UNION ALL SELECT doc_b, doc_a FROM edges),
        |reach(id, m) AS (
        |  SELECT doc_id, doc_id FROM corpus
        |  UNION
        |  SELECT s.dst, r.m FROM reach r JOIN sym s ON s.src = r.id),
        |comp AS (SELECT id AS doc_id, min(m) AS cluster_id FROM reach GROUP BY id),
        |sizes AS (
        |  SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
        |SELECT c.doc_id, c.cluster_id, s.cluster_size,
        |  (c.doc_id = c.cluster_id) AS is_canonical
        |FROM comp c JOIN sizes s USING (cluster_id)
        |ORDER BY c.doc_id""".stripMargin,

    // x02's pair pipeline + x21's md5-bucket split expression.
    "x38_split_leakage" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000,
        |    array_to_string(
        |      (string_split_regex(text, '\s+'))[1:len(string_split_regex(text, '\s+')) - 3],
        |      ' ')
        |  FROM documents),
        |tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM corpus),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                   for i in range(1, len(t) - 1)]) AS s
        |  FROM tok WHERE len(t) >= 3),
        |sig AS (
        |  SELECT doc_id, s,
        |    [list_min([substr(md5(x || '#' || CAST(h // 4 AS VARCHAR)),
        |                      CAST(1 + 8 * (h % 4) AS INT), 8) for x in s])
        |     for h in range(0, 12)] AS g
        |  FROM sh),
        |bands AS (
        |  SELECT doc_id, b, md5(g[3*b+1] || g[3*b+2] || g[3*b+3]) AS bh
        |  FROM sig, range(0, 4) r(b)),
        |cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT doc_a, doc_b,
        |    CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        |      / CAST(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))
        |             AS DOUBLE) AS jac
        |  FROM cand
        |  JOIN sh sa ON sa.doc_id = doc_a
        |  JOIN sh sb ON sb.doc_id = doc_b),
        |p AS (SELECT doc_a, doc_b, jac FROM j WHERE jac >= 0.5),
        |sp AS (
        |  SELECT doc_a, doc_b, jac,
        |    CASE WHEN (strpos('0123456789abcdef',
        |                substr(md5(CAST(doc_a AS VARCHAR)), 1, 1)) - 1) * 16 +
        |              (strpos('0123456789abcdef',
        |                substr(md5(CAST(doc_a AS VARCHAR)), 2, 1)) - 1) < 230
        |         THEN 'train' ELSE 'holdout' END AS split_a,
        |    CASE WHEN (strpos('0123456789abcdef',
        |                substr(md5(CAST(doc_b AS VARCHAR)), 1, 1)) - 1) * 16 +
        |              (strpos('0123456789abcdef',
        |                substr(md5(CAST(doc_b AS VARCHAR)), 2, 1)) - 1) < 230
        |         THEN 'train' ELSE 'holdout' END AS split_b
        |  FROM p)
        |SELECT split_a, split_b,
        |  count(*) AS n_pairs,
        |  CAST(sum(floor(jac * 1e4 + 0.5)) AS BIGINT) / (count(*) * 10000.0)
        |    AS avg_jac,
        |  (split_a <> split_b) AS leaky
        |FROM sp GROUP BY split_a, split_b
        |ORDER BY split_a, split_b""".stripMargin,

    // x23's recursive-closure machinery with the survivor rule swapped
    // from min-id to per-cluster token-length ranking.
    "x37_quality_survivor" ->
      """WITH RECURSIVE tok0 AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
        |corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000,
        |    array_to_string(t[1:greatest(CAST(floor(len(t) * 0.8) AS INT), 1)], ' ')
        |  FROM tok0 WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id + 20000,
        |    array_to_string(t[1:greatest(CAST(floor(len(t) * 0.55) AS INT), 1)], ' ')
        |  FROM tok0 WHERE doc_id % 4 = 0),
        |tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM corpus),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                   for i in range(1, len(t) - 1)]) AS s
        |  FROM tok WHERE len(t) >= 3),
        |sig AS (
        |  SELECT doc_id, s,
        |    [list_min([substr(md5(x || '#' || CAST(h // 4 AS VARCHAR)),
        |                      CAST(1 + 8 * (h % 4) AS INT), 8) for x in s])
        |     for h in range(0, 12)] AS g
        |  FROM sh),
        |bands AS (
        |  SELECT doc_id, b, md5(g[3*b+1] || g[3*b+2] || g[3*b+3]) AS bh
        |  FROM sig, range(0, 4) r(b)),
        |cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |edges AS (
        |  SELECT doc_a, doc_b
        |  FROM cand
        |  JOIN sh sa ON sa.doc_id = doc_a
        |  JOIN sh sb ON sb.doc_id = doc_b
        |  WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        |      / CAST(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))
        |             AS DOUBLE) >= 0.5),
        |sym AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM edges
        |  UNION ALL SELECT doc_b, doc_a FROM edges),
        |reach(id, m) AS (
        |  SELECT doc_id, doc_id FROM corpus
        |  UNION
        |  SELECT s.dst, r.m FROM reach r JOIN sym s ON s.src = r.id),
        |comp AS (SELECT id AS doc_id, min(m) AS cluster_id FROM reach GROUP BY id),
        |lens AS (
        |  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM tok),
        |rk AS (
        |  SELECT c.doc_id, c.cluster_id, l.n_tokens,
        |    row_number() OVER (PARTITION BY c.cluster_id
        |                       ORDER BY l.n_tokens DESC, c.doc_id) AS rk
        |  FROM comp c JOIN lens l USING (doc_id))
        |SELECT doc_id, cluster_id, n_tokens, (rk = 1) AS survivor
        |FROM rk ORDER BY doc_id""".stripMargin,

    "x24_contamination" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
        |vocab AS (
        |  SELECT DISTINCT unnest(
        |    list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
        |                   || t[i+3] || ' ' || t[i+4]
        |                   for i in range(1, len(t) - 3)])) AS gram
        |  FROM tok WHERE len(t) >= 5),
        |ev AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN t[1:greatest(len(t) - 2, 1)]
        |         ELSE list_reverse(t) END AS et
        |  FROM tok),
        |evg AS (
        |  SELECT doc_id + 50000 AS eval_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'leaked' ELSE 'fresh' END AS origin,
        |    unnest(list_distinct([et[i] || ' ' || et[i+1] || ' ' || et[i+2] || ' '
        |                          || et[i+3] || ' ' || et[i+4]
        |                          for i in range(1, len(et) - 3)])) AS gram
        |  FROM ev WHERE len(et) >= 5),
        |j AS (
        |  SELECT e.eval_id, e.origin,
        |    count(*) AS n_grams,
        |    CAST(sum(CASE WHEN v.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_hit
        |  FROM evg e LEFT JOIN vocab v USING (gram)
        |  GROUP BY 1, 2)
        |SELECT eval_id, origin, n_grams, n_hit,
        |  round(CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE), 4) AS contam_ratio,
        |  (round(CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE), 4) >= 0.2)
        |    AS contaminated
        |FROM j ORDER BY eval_id""".stripMargin,

    "x25_corpus_ngrams" ->
      """WITH tok AS (
        |  SELECT lang, string_split_regex(text, '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT lang,
        |    unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                          for i in range(1, len(t) - 1)])) AS gram
        |  FROM tok WHERE len(t) >= 3),
        |df AS (SELECT lang, gram, count(*) AS df FROM sh GROUP BY lang, gram),
        |r AS (
        |  SELECT lang, gram, df,
        |    CAST(row_number() OVER (PARTITION BY lang
        |                            ORDER BY df DESC, gram) AS BIGINT) AS rnk
        |  FROM df)
        |SELECT lang, rnk, gram, df FROM r WHERE rnk <= 10
        |ORDER BY lang, rnk""".stripMargin,

    // Same regex subset in RE2 (DuckDB) and java.util.regex: no
    // lookaround/backreferences, `\b` word boundaries, explicit 'g'
    // flag (DuckDB regexp_replace is first-match-only by default;
    // Spark's replaces all).
    "x26_pii_redaction" ->
      """WITH p AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0
        |         THEN ' Contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 0
        |         THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
        |              || '-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0
        |         THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
        |              || '.0.' || CAST((doc_id * 3) % 256 AS VARCHAR)
        |         ELSE '' END AS pii_text
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, pii_text,
        |    regexp_replace(regexp_replace(regexp_replace(pii_text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |      '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g') AS red
        |  FROM p)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(pii_text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(pii_text,
        |    '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(pii_text,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  CAST(len(red) AS BIGINT) AS redacted_len,
        |  md5(red) AS redacted_md5
        |FROM r ORDER BY doc_id""".stripMargin,

    "x21_hash_split" ->
      """WITH s AS (
        |  SELECT lang, n_chars,
        |    CASE WHEN
        |      (strpos('0123456789abcdef',
        |              substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 +
        |      (strpos('0123456789abcdef',
        |              substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < 230
        |    THEN 'train' ELSE 'holdout' END AS split
        |  FROM documents)
        |SELECT split, lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM s GROUP BY split, lang
        |ORDER BY split, lang""".stripMargin,

    "x20_tfidf_topterms" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
        |df AS (
        |  SELECT token, count(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (
        |  SELECT t.doc_id, t.token, t.tf,
        |    round(ln((n.n + 1.0) / (d.df + 1.0)) + 1.0, 6) AS idf6
        |  FROM tf t JOIN df d USING (token), n
        |  WHERE t.doc_id < 50),
        |r AS (
        |  SELECT doc_id, token, tf,
        |    round(tf * idf6, 4) AS score4,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY round(tf * idf6, 4) DESC, token) AS BIGINT) AS rnk
        |  FROM s)
        |SELECT doc_id, rnk, token, tf, score4
        |FROM r WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,

    "x19_context_pack" ->
      """WITH tok AS (
        |  SELECT doc_id, source, lang,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, source, lang, n_tokens,
        |    CAST(sum(n_tokens) OVER (
        |      PARTITION BY source, lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - n_tokens AS tok_offset
        |  FROM tok)
        |SELECT doc_id, source, lang, n_tokens, tok_offset,
        |  CAST(floor(tok_offset / 512) AS BIGINT) AS first_chunk,
        |  CAST(floor((tok_offset + greatest(n_tokens, 1) - 1) / 512) AS BIGINT)
        |    AS last_chunk,
        |  CAST(floor((tok_offset + greatest(n_tokens, 1) - 1) / 512) AS BIGINT)
        |    - CAST(floor(tok_offset / 512) AS BIGINT) + 1 AS n_chunks
        |FROM o ORDER BY doc_id""".stripMargin,

    "x18_int8_quant" ->
      s"""WITH p AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |s AS (
         |  SELECT vec_id, v,
         |    CASE WHEN list_max([abs(x) for x in v]) = 0 THEN 1.0
         |         ELSE 127.0 / list_max([abs(x) for x in v]) END AS scale
         |  FROM p),
         |q AS (
         |  SELECT vec_id, v, scale,
         |    [CAST(round(x * scale) AS INT) for x in v] AS qv
         |  FROM s),
         |d AS (
         |  SELECT vec_id, v, scale, qv,
         |    [CAST(x AS DOUBLE) / scale for x in qv] AS deq
         |  FROM q)
         |SELECT vec_id,
         |  round(scale, 4) AS scale4,
         |  CAST(list_sum([abs(x) for x in qv]) AS BIGINT) AS q_l1,
         |  round(list_max([abs(v[i] - deq[i]) for i in range(1, len(v)+1)]), 6)
         |    AS max_err6,
         |  round(${cosineSql("v", "deq")}, 6) AS recon_cos6
         |FROM d ORDER BY vec_id""".stripMargin,

    // The oracle recomputes the sketch itself: distinct 8-hex md5
    // hashes per lang, the 64th smallest (lexicographic = numeric for
    // fixed-width hex), and the identical (k−1)/f arithmetic.
    "x27_kmv_distinct" ->
      """WITH tok AS (
        |  SELECT lang, string_split_regex(text, '\s+') AS t FROM documents),
        |grams AS (
        |  SELECT lang,
        |    unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                          for i in range(1, len(t) - 1)])) AS token
        |  FROM tok WHERE len(t) >= 3),
        |h AS (
        |  SELECT DISTINCT lang, substr(md5(token), 1, 8) AS h FROM grams),
        |r AS (
        |  SELECT lang, h,
        |    row_number() OVER (PARTITION BY lang ORDER BY h) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS nd
        |  FROM h),
        |kth AS (
        |  SELECT lang, max(CASE WHEN rn = 64 THEN h END) AS kth_hash,
        |    max(nd) AS nd
        |  FROM r GROUP BY lang),
        |ex AS (
        |  SELECT lang, count(DISTINCT token) AS exact_distinct
        |  FROM grams GROUP BY lang)
        |SELECT e.lang, e.exact_distinct,
        |  round(CASE WHEN k.kth_hash IS NULL THEN CAST(k.nd AS DOUBLE)
        |    ELSE 63.0 / ((CAST(list_sum(
        |      [(strpos('0123456789abcdef', substr(k.kth_hash, i, 1)) - 1)
        |       * CAST(pow(16, 8 - i) AS BIGINT) for i in range(1, 9)])
        |      AS DOUBLE) + 1.0) / 4294967296.0)
        |    END, 4) AS kmv_estimate,
        |  k.kth_hash
        |FROM ex e JOIN kth k USING (lang)
        |ORDER BY e.lang""".stripMargin,

    "x28_edit_neardup" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents WHERE n_chars >= 40),
        |corpus AS (
        |  SELECT doc_id, text FROM docs
        |  UNION ALL
        |  SELECT doc_id + 10000, substr(text, 1, length(text) - 4) || ' zq'
        |  FROM docs),
        |c AS (
        |  SELECT doc_id, md5(substr(text, 1, 32)) AS blk,
        |    substr(text, greatest(length(text) - 63, 1), 64) AS tail
        |  FROM corpus)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.tail, b.tail) AS BIGINT) AS edit_dist
        |FROM c a JOIN c b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.tail, b.tail) <= 10
        |ORDER BY doc_a, doc_b""".stripMargin,

    "x29_incremental_dedup" ->
      """WITH batch AS (
        |  SELECT doc_id + 10000 AS doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN text
        |         ELSE array_to_string(
        |           list_reverse(string_split_regex(text, '\s+')), ' ')
        |    END AS text,
        |    lang
        |  FROM documents),
        |k AS (
        |  SELECT b.doc_id, b.lang, md5(b.text) AS h
        |  FROM batch b
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM documents d WHERE md5(d.text) = md5(b.text))),
        |r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
        |  FROM k)
        |SELECT doc_id, lang FROM r WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,

    "x30_source_cap" ->
      """SELECT source, lang, pick, doc_id FROM (
        |  SELECT source, lang, doc_id,
        |    CAST(row_number() OVER (PARTITION BY source, lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS pick
        |  FROM documents)
        |WHERE pick <= 20
        |ORDER BY source, lang, pick""".stripMargin,

    "x31_stride_chunks" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    unnest(range(0,
        |      greatest(CAST(ceil(CAST(n_tokens - 128 AS DOUBLE) / 96.0)
        |                    AS BIGINT), 0) + 1)) AS chunk_idx
        |  FROM tok)
        |SELECT doc_id, n_tokens, chunk_idx,
        |  chunk_idx * 96 AS tok_start,
        |  least(chunk_idx * 96 + 128, n_tokens) AS tok_end
        |FROM c
        |WHERE chunk_idx * 96 < n_tokens
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    "x32_unigram_logprob" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
        |  FROM documents),
        |vocab AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
        |tot AS (SELECT count(*) AS total FROM tok),
        |scored AS (
        |  SELECT t.doc_id,
        |    CAST(round(round(ln(CAST(v.c AS DOUBLE) / CAST(tot.total AS DOUBLE)), 6)
        |               * 1e6) AS BIGINT) AS lp6_e6
        |  FROM tok t JOIN vocab v USING (token), tot)
        |SELECT doc_id,
        |  count(*) AS n_tokens,
        |  round(CAST(sum(lp6_e6) AS DOUBLE)
        |        / CAST(count(*) * 1000000 AS DOUBLE), 4) AS avg_logp
        |FROM scored
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "x33_length_histogram" ->
      """SELECT lang,
        |  least(CAST(floor(n_chars / 100) AS BIGINT), 9) AS bucket,
        |  count(*) AS n_docs,
        |  min(n_chars) AS min_chars,
        |  max(n_chars) AS max_chars
        |FROM documents
        |GROUP BY 1, 2
        |ORDER BY lang, bucket""".stripMargin,

    // x34: code width scales with the 2n bucketized rows exactly as
    // the engine's planesFor does — same integer ladder, hyperplane
    // formula inline (see the x10 oracle note).
    "x34_semantic_contamination" -> {
      def varBucket(v: String): String =
        s"""CAST(list_sum(
           |      [CASE WHEN list_sum(
           |         [$v[i] * ((((i-1)*37 + j*101) % 13) - 6)
           |          for i in range(1, len($v)+1)]) > 0
           |       THEN (CAST(1 AS BIGINT) << j) ELSE 0 END
           |       for j in range(0, planes)]) AS BIGINT)""".stripMargin
      s"""WITH base AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |nn AS (SELECT 2 * count(*) AS n FROM embeddings),
         |par AS (
         |  SELECT CAST(8 + list_sum(
         |    [CASE WHEN n > 256 * (CAST(1 AS BIGINT) << t) THEN 1 ELSE 0 END
         |     for t in range(8, 24)]) AS INT) AS planes
         |  FROM nn),
         |ev AS (
         |  SELECT vec_id + 50000 AS eval_id,
         |    CASE WHEN vec_id % 2 = 0 THEN 'leaked' ELSE 'fresh' END AS origin,
         |    CASE WHEN vec_id % 2 = 0
         |         THEN [v[i] * 1.02 + CAST(((i - 1) % 7) - 3 AS DOUBLE) * 0.0001
         |               for i in range(1, len(v)+1)]
         |         ELSE list_reverse(v) END AS ev
         |  FROM base),
         |evb AS (SELECT eval_id, origin, ev, ${varBucket("ev")} AS bucket
         |        FROM ev, par),
         |cb AS (SELECT vec_id, v, ${varBucket("v")} AS bucket FROM base, par),
         |j AS (
         |  SELECT e.eval_id, e.origin, c.vec_id,
         |    CASE WHEN c.vec_id IS NOT NULL
         |           AND ${cosineSql("e.ev", "c.v")} >= 0.99
         |         THEN 1 ELSE 0 END AS hit
         |  FROM evb e LEFT JOIN cb c ON e.bucket = c.bucket)
         |SELECT eval_id, origin,
         |  count(vec_id) AS n_candidates,
         |  CAST(sum(hit) AS BIGINT) AS n_hits,
         |  (sum(hit) > 0) AS contaminated
         |FROM j GROUP BY eval_id, origin
         |ORDER BY eval_id""".stripMargin
    },

    // Same signature construction as x02's oracle (8-hex chunk h%4 of
    // md5(shingle + '#' + h/4), min over the shingle set).
    "x36_minhash_fidelity" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000,
        |    array_to_string(
        |      (string_split_regex(text, '\s+'))[1:len(string_split_regex(text, '\s+')) - 3],
        |      ' ')
        |  FROM documents),
        |tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM corpus),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                   for i in range(1, len(t) - 1)]) AS s
        |  FROM tok WHERE len(t) >= 3),
        |sig AS (
        |  SELECT doc_id, s,
        |    [list_min([substr(md5(x || '#' || CAST(h // 4 AS VARCHAR)),
        |                      CAST(1 + 8 * (h % 4) AS INT), 8) for x in s])
        |     for h in range(0, 12)] AS g
        |  FROM sh),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(len(list_filter(range(1, 13), i -> a.g[i] = b.g[i]))
        |         AS BIGINT) AS agree,
        |    round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))
        |             AS DOUBLE), 4) AS exact_jac
        |  FROM sig a JOIN sig b ON a.doc_id + 10000 = b.doc_id)
        |SELECT doc_a, doc_b, agree, exact_jac,
        |  round(CAST(agree AS DOUBLE) / 12.0, 4) AS est_jac,
        |  CAST(abs(floor(round(CAST(agree AS DOUBLE) / 12.0, 4) * 10000 + 0.5)
        |       - floor(exact_jac * 10000 + 0.5)) AS BIGINT) AS err_pp
        |FROM p ORDER BY doc_a""".stripMargin,

    "x35_embed_normalize" ->
      """WITH p AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (
        |  SELECT vec_id, v,
        |    sqrt(list_reduce(list_prepend(0.0, [x * x for x in v]),
        |                     (a, x) -> a + x)) AS nrm
        |  FROM p),
        |u AS (
        |  SELECT vec_id, nrm, [x / nrm for x in v] AS unit, v
        |  FROM n)
        |SELECT vec_id,
        |  round(nrm, 4) AS norm4,
        |  round(sqrt(list_reduce(list_prepend(0.0, [x * x for x in unit]),
        |                         (a, x) -> a + x)), 4) AS unit_norm4,
        |  round(sqrt(list_reduce(list_prepend(0.0, [x * x for x in v[1:16]]),
        |                         (a, x) -> a + x)) / nrm, 4) AS prefix16_mass4
        |FROM u ORDER BY vec_id""".stripMargin,

    "x15_sql_cosine" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
         |           FROM embeddings WHERE vec_id = 0),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings)
         |SELECT e.vec_id,
         |  floor(${cosineSql("cv", "qv")} * 10000 + 0.5) / 10000.0 AS cos_q0
         |FROM e, q
         |ORDER BY e.vec_id""".stripMargin,

    "x12_ngram_jaccard_blocked" ->
      s"""WITH tok AS (
        |  SELECT doc_id, source, lang, string_split_regex(text, '\\s+') AS t
        |  FROM documents),
        |sh0 AS (
        |  SELECT doc_id, source, lang,
        |    list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                   for i in range(1, len(t) - 1)]) AS s
        |  FROM tok WHERE len(t) >= 3),
        |sh AS (
        |  SELECT doc_id, source, lang, s FROM (
        |    SELECT *, row_number() OVER (PARTITION BY source, lang
        |      ORDER BY doc_id) AS r FROM sh0)
        |  WHERE r <= $X12SampleCap),
        |p AS (
        |  SELECT a.source AS source, a.lang AS lang,
        |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))
        |             AS DOUBLE) AS jac
        |  FROM sh a JOIN sh b
        |    ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id)
        |SELECT source, lang,
        |  count(*) AS n_pairs,
        |  CAST(sum(CASE WHEN jac >= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_similar,
        |  round(max(jac), 4) AS max_jac,
        |  round(avg(jac), 4) AS avg_jac,
        |  CAST($X12SampleCap AS BIGINT) AS sample_cap
        |FROM p
        |GROUP BY source, lang
        |ORDER BY source, lang""".stripMargin,

    // x38's pair pipeline + x23's recursive closure, with x21's
    // md5-bucket split applied to the CLUSTER id.
    "x39_group_split" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000,
        |    array_to_string(
        |      (string_split_regex(text, '\s+'))[1:len(string_split_regex(text, '\s+')) - 3],
        |      ' ')
        |  FROM documents),
        |tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM corpus),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                   for i in range(1, len(t) - 1)]) AS s
        |  FROM tok WHERE len(t) >= 3),
        |sig AS (
        |  SELECT doc_id, s,
        |    [list_min([substr(md5(x || '#' || CAST(h // 4 AS VARCHAR)),
        |                      CAST(1 + 8 * (h % 4) AS INT), 8) for x in s])
        |     for h in range(0, 12)] AS g
        |  FROM sh),
        |bands AS (
        |  SELECT doc_id, b, md5(g[3*b+1] || g[3*b+2] || g[3*b+3]) AS bh
        |  FROM sig, range(0, 4) r(b)),
        |cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |edges AS (
        |  SELECT doc_a, doc_b
        |  FROM cand
        |  JOIN sh sa ON sa.doc_id = doc_a
        |  JOIN sh sb ON sb.doc_id = doc_b
        |  WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        |      / CAST(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))
        |             AS DOUBLE) >= 0.5),
        |sym AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM edges
        |  UNION ALL SELECT doc_b, doc_a FROM edges),
        |reach(id, m) AS (
        |  SELECT doc_id, doc_id FROM corpus
        |  UNION
        |  SELECT s.dst, r.m FROM reach r JOIN sym s ON s.src = r.id),
        |comp AS (SELECT id AS doc_id, min(m) AS cluster_id FROM reach GROUP BY id)
        |SELECT doc_id, cluster_id,
        |  CASE WHEN (strpos('0123456789abcdef',
        |              substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1)) - 1) * 16 +
        |            (strpos('0123456789abcdef',
        |              substr(md5(CAST(cluster_id AS VARCHAR)), 2, 1)) - 1) < 230
        |       THEN 'train' ELSE 'holdout' END AS split
        |FROM comp
        |ORDER BY doc_id""".stripMargin,

    // The md5-bucketed 4×256 counter grid recomputed relationally;
    // min-of-4-cells per probed gram. All integers.
    "x40_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                   for i in range(1, len(t) - 1)]) AS s
        |  FROM tok WHERE len(t) >= 3),
        |occ AS (SELECT doc_id, unnest(s) AS gram FROM sh),
        |exact AS (SELECT gram, count(*) AS exact_df FROM occ GROUP BY gram),
        |grid AS (
        |  SELECT r,
        |    (strpos('0123456789abcdef',
        |       substr(md5(gram || '#' || CAST(r AS VARCHAR)), 1, 1)) - 1) * 16 +
        |    (strpos('0123456789abcdef',
        |       substr(md5(gram || '#' || CAST(r AS VARCHAR)), 2, 1)) - 1) AS bucket,
        |    count(*) AS cnt
        |  FROM occ, range(0, 4) rr(r)
        |  GROUP BY 1, 2),
        |top AS (
        |  SELECT gram, exact_df,
        |    CAST(row_number() OVER (ORDER BY exact_df DESC, gram) AS BIGINT) AS rnk
        |  FROM exact
        |  QUALIFY rnk <= 20),
        |probe AS (
        |  SELECT t.rnk, t.gram, t.exact_df, r,
        |    (strpos('0123456789abcdef',
        |       substr(md5(t.gram || '#' || CAST(r AS VARCHAR)), 1, 1)) - 1) * 16 +
        |    (strpos('0123456789abcdef',
        |       substr(md5(t.gram || '#' || CAST(r AS VARCHAR)), 2, 1)) - 1) AS bucket
        |  FROM top t, range(0, 4) rr(r)),
        |est AS (
        |  SELECT p.rnk, p.gram, p.exact_df, min(g.cnt) AS cms_est
        |  FROM probe p JOIN grid g ON g.r = p.r AND g.bucket = p.bucket
        |  GROUP BY 1, 2, 3)
        |SELECT rnk, gram, exact_df, cms_est, cms_est - exact_df AS overest
        |FROM est ORDER BY rnk""".stripMargin,

    // (x41_zorder_layout's oracle left with its query — retired to
    // spec-only in round 15; x93 carries the registered z-order form.)

    // x02's full-corpus recompute, restricted to pairs that TOUCH the
    // new batch (doc_b >= 10000 — any pair with a batch member has its
    // higher id there): the incremental probe must find exactly those.
    // The 25 index-internal pairs the full recompute also surfaces are
    // natural near-dups WITHIN the original corpus — already-resolved
    // history an incremental pass rightly never re-derives.
    // the new-batch side is tagged EXPLICITLY (nw) rather than inferred
    // from an id range: `doc_b >= 10000` was only true while original
    // doc_ids stayed below 10000, and silently admitted original-vs-
    // original pairs once MakeSf's scaled copies shifted ids by c·10⁷
    // (2301 phantom rows at sf1)
    "x42_incremental_lsh" ->
      """WITH corpus AS (
        |  SELECT doc_id, text, 0 AS nw FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000,
        |    array_to_string(
        |      (string_split_regex(text, '\s+'))[1:len(string_split_regex(text, '\s+')) - 3],
        |      ' '),
        |    1 AS nw
        |  FROM documents),
        |tok AS (SELECT doc_id, nw, string_split_regex(text, '\s+') AS t FROM corpus),
        |sh AS (
        |  SELECT doc_id, nw,
        |    list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                   for i in range(1, len(t) - 1)]) AS s
        |  FROM tok WHERE len(t) >= 3),
        |sig AS (
        |  SELECT doc_id, s,
        |    [list_min([substr(md5(x || '#' || CAST(h // 4 AS VARCHAR)),
        |                      CAST(1 + 8 * (h % 4) AS INT), 8) for x in s])
        |     for h in range(0, 12)] AS g
        |  FROM sh),
        |bands AS (
        |  SELECT doc_id, b, md5(g[3*b+1] || g[3*b+2] || g[3*b+3]) AS bh
        |  FROM sig, range(0, 4) r(b)),
        |cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT doc_a, doc_b,
        |    CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        |      / CAST(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))
        |             AS DOUBLE) AS jac,
        |    sa.nw + sb.nw AS nw2
        |  FROM cand
        |  JOIN sh sa ON sa.doc_id = doc_a
        |  JOIN sh sb ON sb.doc_id = doc_b)
        |SELECT doc_a, doc_b, round(jac, 4) AS jaccard
        |FROM j WHERE jac >= 0.5 AND nw2 > 0
        |ORDER BY doc_a, doc_b""".stripMargin,

    "x43_mixture_sample" ->
      """SELECT doc_id, lang, source, rn, quota, (rn <= quota) AS selected
        |FROM (
        |  SELECT doc_id, lang, source,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)), doc_id)
        |      AS BIGINT) AS rn,
        |    CAST(CASE lang WHEN 'en' THEN 120 WHEN 'de' THEN 60
        |                   WHEN 'fr' THEN 60 WHEN 'es' THEN 30
        |                   WHEN 'zh' THEN 30 ELSE 0 END AS BIGINT) AS quota
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "x44_bigram_lm" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
        |bgw AS (
        |  SELECT doc_id, b, string_split(b, ' ')[1] AS w1 FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(generate_series(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1])) AS b
        |    FROM tok WHERE len(t) >= 2)),
        |cb AS (SELECT b, count(*) AS cb FROM bgw GROUP BY b),
        |cw AS (SELECT w1, count(*) AS cw FROM bgw GROUP BY w1),
        |v AS (SELECT count(DISTINCT token) AS v
        |      FROM (SELECT unnest(t) AS token FROM tok)),
        |scored AS (
        |  SELECT g.doc_id,
        |    CAST(round(round(ln((CAST(cb.cb AS DOUBLE) + 1.0)
        |      / (CAST(cw.cw AS DOUBLE) + CAST(v.v AS DOUBLE))), 6) * 1e6)
        |      AS BIGINT) AS lp_e6
        |  FROM bgw g JOIN cb USING (b) JOIN cw USING (w1), v)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(CAST(sum(lp_e6) AS DOUBLE) / (count(*) * 1000000.0), 4)
        |    AS avg_logp
        |FROM scored GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "x45_snapshot_diff" ->
      """WITH v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 1 THEN text || ' rev2' ELSE text END AS text,
        |    source
        |  FROM documents WHERE doc_id % 10 <> 0
        |  UNION ALL
        |  SELECT doc_id + 20000, 'fresh ' || text, source
        |  FROM documents WHERE doc_id % 10 = 2)
        |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
        |  COALESCE(a.source, b.source) AS source,
        |  CASE WHEN b.doc_id IS NULL THEN 'removed'
        |       WHEN a.doc_id IS NULL THEN 'added'
        |       WHEN md5(a.text) <> md5(b.text) THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM documents a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
        |ORDER BY doc_id""".stripMargin,

    "x46_dq_expectations" ->
      """WITH agg AS (
        |  SELECT count(*) AS n_rows,
        |    CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS null_value,
        |    CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS negative_value,
        |    CAST(sum(CASE WHEN event_type NOT IN
        |      ('click', 'view', 'purchase', 'signup', 'error')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS unknown_event_type,
        |    CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS null_ts,
        |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-01 00:00:00'
        |      OR ts >= TIMESTAMP '2026-01-01 00:00:00'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS ts_out_of_range,
        |    count(*) - count(DISTINCT event_id) AS duplicate_event_id,
        |    CAST(sum(CASE WHEN props IS NULL OR props NOT LIKE '{%'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS malformed_props
        |  FROM events),
        |checks AS (
        |  SELECT 'duplicate_event_id' AS check_name, n_rows,
        |    duplicate_event_id AS n_violations FROM agg
        |  UNION ALL SELECT 'malformed_props', n_rows, malformed_props FROM agg
        |  UNION ALL SELECT 'negative_value', n_rows, negative_value FROM agg
        |  UNION ALL SELECT 'null_ts', n_rows, null_ts FROM agg
        |  UNION ALL SELECT 'null_value', n_rows, null_value FROM agg
        |  UNION ALL SELECT 'ts_out_of_range', n_rows, ts_out_of_range FROM agg
        |  UNION ALL SELECT 'unknown_event_type', n_rows, unknown_event_type
        |    FROM agg)
        |SELECT check_name, n_rows, n_violations,
        |  CAST(floor(CAST(n_violations * 1000000 AS DOUBLE)
        |    / CAST(n_rows AS DOUBLE)) AS BIGINT) AS violation_ppm
        |FROM checks
        |ORDER BY check_name""".stripMargin,

    "x47_rolling_active" ->
      """WITH pairs AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |days AS (SELECT DISTINCT d AS day FROM pairs)
        |SELECT day, count(DISTINCT user_id) AS active_users_7d,
        |  count(DISTINCT d) AS days_covered
        |FROM pairs JOIN days ON d >= day - 6 AND d <= day
        |GROUP BY day
        |ORDER BY day""".stripMargin,

    "x48_outlier_fences" ->
      """WITH base AS (
        |  SELECT event_type, event_id,
        |    CASE WHEN event_id % 199 = 0 THEN value * 25.0 ELSE value END AS v
        |  FROM events),
        |ranked AS (
        |  SELECT event_type, v,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY v, event_id) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM base),
        |pct AS (
        |  SELECT event_type,
        |    max(CASE WHEN rn = CAST(floor((n - 1) * 0.25) AS BIGINT) + 1
        |        THEN v END) AS p25,
        |    max(CASE WHEN rn = CAST(floor((n - 1) * 0.75) AS BIGINT) + 1
        |        THEN v END) AS p75
        |  FROM ranked GROUP BY event_type),
        |bounds AS (
        |  SELECT event_type, p75 + (p75 - p25) * 1.5 AS hi,
        |    p25 - (p75 - p25) * 1.5 AS lo
        |  FROM pct)
        |SELECT b.event_type, count(*) AS n_events,
        |  CAST(sum(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
        |  CAST(sum(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
        |  round(max(hi), 2) AS hi_fence, round(max(lo), 2) AS lo_fence
        |FROM base b JOIN bounds USING (event_type)
        |GROUP BY b.event_type
        |ORDER BY b.event_type""".stripMargin,

    "x49_chunk_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000,
        |    array_to_string(
        |      (string_split_regex(text, '\s+'))[1:len(string_split_regex(text, '\s+')) - 3],
        |      ' ')
        |  FROM documents),
        |chunks AS (
        |  SELECT doc_id,
        |    unnest(list_transform(
        |      generate_series(0, CAST(floor((len(t) - 1) / 20) AS INT)),
        |      i -> md5(array_to_string(t[i*20+1 : i*20+20], ' ')))) AS h
        |  FROM (SELECT doc_id, string_split_regex(text, '\s+') AS t
        |        FROM corpus)),
        |occ AS (
        |  SELECT h, count(DISTINCT doc_id) AS docs_with FROM chunks GROUP BY h)
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN docs_with > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_chunks,
        |  CAST(floor(
        |    CAST(sum(CASE WHEN docs_with > 1 THEN 1 ELSE 0 END) * 1000000
        |         AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS dup_ppm
        |FROM chunks JOIN occ USING (h)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "x50_binned_quantiles" ->
      """WITH hist AS (
        |  SELECT event_type,
        |    CAST(least(floor(value / 0.5), 999) AS BIGINT) AS bin,
        |    count(*) AS c
        |  FROM events GROUP BY event_type, bin),
        |cum AS (
        |  SELECT event_type, bin, c,
        |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY bin)
        |         AS BIGINT) AS cum,
        |    CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM hist)
        |SELECT event_type, max(n) AS n_events,
        |  (min(CASE WHEN cum >= ceil(n * 0.5) THEN bin END) + 1) * 0.5
        |    AS p50_ub,
        |  (min(CASE WHEN cum >= ceil(n * 0.9) THEN bin END) + 1) * 0.5
        |    AS p90_ub,
        |  (min(CASE WHEN cum >= ceil(n * 0.99) THEN bin END) + 1) * 0.5
        |    AS p99_ub
        |FROM cum
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "x51_temperature_mix" ->
      """WITH s AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(round(round(pow(CAST(count(*) AS DOUBLE), 0.7), 6) * 1e6)
        |         AS BIGINT) AS w_e6
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(w_e6) AS BIGINT) AS total_e6 FROM s)
        |SELECT source, n_docs, w_e6, (3000 * w_e6) // total_e6 AS quota
        |FROM s, t
        |ORDER BY source""".stripMargin,

    "x52_segment_dedup_rebuild" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000,
        |    array_to_string(
        |      (string_split_regex(text, '\s+'))[1:greatest(len(string_split_regex(text, '\s+')) - 3, 0)],
        |      ' ')
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM corpus),
        |ix AS (
        |  SELECT doc_id, t,
        |    unnest(range(0, CAST(floor((len(t) - 1) / 15) AS BIGINT) + 1))
        |      AS idx
        |  FROM tok),
        |segs AS (
        |  SELECT doc_id, idx,
        |    array_to_string(t[idx*15+1 : idx*15+15], ' ') AS seg,
        |    md5(array_to_string(t[idx*15+1 : idx*15+15], ' ')) AS h
        |  FROM ix),
        |occ AS (
        |  SELECT h, count(DISTINCT doc_id) AS docs_with FROM segs GROUP BY h)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_segs,
        |  CAST(sum(CASE WHEN docs_with = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  md5(coalesce(
        |    string_agg(CASE WHEN docs_with = 1 THEN seg END, ' '
        |               ORDER BY idx), '')) AS clean_md5
        |FROM segs JOIN occ USING (h)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "x53_vocab_coverage" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
        |  FROM documents),
        |vocab AS (
        |  SELECT token FROM (
        |    SELECT token,
        |      row_number() OVER (ORDER BY count(*) DESC, token) AS rnk
        |    FROM tok GROUP BY token)
        |  WHERE rnk <= 25)
        |SELECT t.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_oov,
        |  (CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000) // CAST(count(*) AS BIGINT) AS oov_ppm
        |FROM tok t LEFT JOIN vocab v ON t.token = v.token
        |GROUP BY t.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    "x54_source_drift" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split_regex(text, '\s+')) AS token
        |  FROM documents),
        |corpus AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
        |n AS (SELECT count(*) AS n FROM tok),
        |bysrc AS (
        |  SELECT source, token, count(*) AS c_s
        |  FROM tok GROUP BY source, token),
        |ns AS (SELECT source, count(*) AS n_s FROM tok GROUP BY source),
        |terms AS (
        |  SELECT b.source, b.token, ns.n_s,
        |    b.c_s * (
        |      CAST(round(round(ln(CAST(b.c_s AS DOUBLE)
        |                          / CAST(ns.n_s AS DOUBLE)), 6) * 1e6)
        |           AS BIGINT)
        |      - CAST(round(round(ln(CAST(corpus.c AS DOUBLE)
        |                            / CAST(n.n AS DOUBLE)), 6) * 1e6)
        |             AS BIGINT)) AS term
        |  FROM bysrc b
        |  JOIN ns USING (source)
        |  JOIN corpus USING (token), n)
        |SELECT source,
        |  CAST(max(n_s) AS BIGINT) AS n_tokens,
        |  CAST(count(DISTINCT token) AS BIGINT) AS n_distinct,
        |  greatest(CAST(sum(term) AS BIGINT), 0)
        |    // CAST(max(n_s) AS BIGINT) AS kl_micro
        |FROM terms
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "x55_repeated_spans" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000,
        |    array_to_string(
        |      (string_split_regex(text, '\s+'))[1:greatest(len(string_split_regex(text, '\s+')) - 3, 0)],
        |      ' ')
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM corpus),
        |ix AS (
        |  SELECT doc_id, t,
        |    unnest(range(0, greatest(CAST(len(t) - 10 AS BIGINT) + 1, 0)))
        |      AS idx
        |  FROM tok),
        |wins AS (
        |  SELECT doc_id, idx,
        |    md5(array_to_string(t[idx+1 : idx+10], ' ')) AS h
        |  FROM ix),
        |occ AS (
        |  SELECT h, count(DISTINCT doc_id) AS docs_with FROM wins GROUP BY h),
        |dup AS (
        |  SELECT doc_id, idx,
        |    idx - row_number() OVER (PARTITION BY doc_id ORDER BY idx)
        |      AS island
        |  FROM wins JOIN occ USING (h)
        |  WHERE docs_with > 1),
        |runs AS (
        |  SELECT doc_id, island, count(*) AS run
        |  FROM dup GROUP BY doc_id, island),
        |spans AS (
        |  SELECT doc_id,
        |    CAST(max(run) + 9 AS BIGINT) AS max_span_tokens,
        |    CAST(sum(run) AS BIGINT) AS n_dup_windows
        |  FROM runs GROUP BY doc_id)
        |SELECT c.doc_id,
        |  coalesce(n_dup_windows, 0) AS n_dup_windows,
        |  coalesce(max_span_tokens, 0) AS max_span_tokens
        |FROM corpus c LEFT JOIN spans s ON c.doc_id = s.doc_id
        |ORDER BY c.doc_id""".stripMargin,

    "x65_span_removal" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000,
        |    array_to_string(
        |      (string_split_regex(text, '\s+'))[1:greatest(len(string_split_regex(text, '\s+')) - 3, 0)],
        |      ' ')
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM corpus),
        |ix AS (
        |  SELECT doc_id, t,
        |    unnest(range(0, greatest(CAST(len(t) - 10 AS BIGINT) + 1, 0)))
        |      AS idx
        |  FROM tok),
        |wins AS (
        |  SELECT doc_id, idx,
        |    md5(array_to_string(t[idx+1 : idx+10], ' ')) AS h
        |  FROM ix),
        |occ AS (
        |  SELECT h, count(DISTINCT doc_id) AS docs_with FROM wins GROUP BY h),
        |iv AS (
        |  SELECT doc_id, island,
        |    min(idx) AS s, max(idx) + 9 AS e
        |  FROM (
        |    SELECT doc_id, idx,
        |      idx - row_number() OVER (PARTITION BY doc_id ORDER BY idx)
        |        AS island
        |    FROM wins JOIN occ USING (h)
        |    WHERE docs_with > 1)
        |  GROUP BY doc_id, island),
        |pos AS (
        |  SELECT doc_id, unnest(range(0, CAST(len(t) AS BIGINT))) AS i
        |  FROM tok),
        |rem AS (
        |  SELECT DISTINCT p.doc_id, p.i
        |  FROM pos p JOIN iv ON iv.doc_id = p.doc_id
        |    AND p.i BETWEEN iv.s AND iv.e),
        |kept AS (
        |  SELECT p.doc_id, p.i
        |  FROM pos p LEFT JOIN rem r ON r.doc_id = p.doc_id AND r.i = p.i
        |  WHERE r.i IS NULL),
        |rebuilt AS (
        |  SELECT k.doc_id,
        |    count(*) AS n_kept,
        |    string_agg(tok.t[k.i + 1], ' ' ORDER BY k.i) AS clean
        |  FROM kept k JOIN tok ON tok.doc_id = k.doc_id
        |  GROUP BY k.doc_id)
        |SELECT c.doc_id,
        |  CAST(len(t.t) AS BIGINT) AS n_tokens,
        |  CAST(len(t.t) - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
        |  md5(coalesce(clean, '')) AS clean_md5
        |FROM corpus c
        |JOIN tok t ON t.doc_id = c.doc_id
        |LEFT JOIN rebuilt r ON r.doc_id = c.doc_id
        |ORDER BY c.doc_id""".stripMargin,

    "x56_dsir_weights" ->
      """WITH tb AS (
        |  SELECT doc_id, lang,
        |    (strpos('0123456789abcdef', substr(md5(token), 1, 1)) - 1) * 16 +
        |    (strpos('0123456789abcdef', substr(md5(token), 2, 1)) - 1) AS b
        |  FROM (SELECT doc_id, lang,
        |          unnest(string_split_regex(text, '\s+')) AS token
        |        FROM documents)),
        |tgt AS (SELECT b, count(*) AS c_t FROM tb WHERE lang = 'en' GROUP BY b),
        |raw AS (SELECT b, count(*) AS c_r FROM tb GROUP BY b),
        |tot AS (SELECT count(*) FILTER (WHERE lang = 'en') AS n_t,
        |               count(*) AS n_r
        |        FROM tb),
        |spine AS (SELECT unnest(range(0, 256)) AS b),
        |w AS (
        |  SELECT spine.b,
        |    CAST(round(round(ln(CAST(coalesce(c_t, 0) + 1 AS DOUBLE)
        |                        / CAST(n_t + 256 AS DOUBLE)), 6) * 1e6)
        |         AS BIGINT)
        |    - CAST(round(round(ln(CAST(coalesce(c_r, 0) + 1 AS DOUBLE)
        |                          / CAST(n_r + 256 AS DOUBLE)), 6) * 1e6)
        |           AS BIGINT) AS lw
        |  FROM spine LEFT JOIN tgt USING (b) LEFT JOIN raw USING (b), tot),
        |db AS (SELECT doc_id, b, count(*) AS cnt FROM tb GROUP BY doc_id, b)
        |SELECT doc_id,
        |  CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |  CAST(sum(cnt * lw) AS BIGINT) AS dsir_micro
        |FROM db JOIN w USING (b)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "x57_source_quality_gate" ->
      """WITH tok AS (
        |  SELECT doc_id, source, string_split_regex(text, '\s+') AS t
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, source,
        |    CAST(len(t) AS BIGINT) AS n_tokens,
        |    CAST(CAST(len(list_distinct(t)) AS BIGINT) * 1000000
        |         // CAST(len(t) AS BIGINT) AS BIGINT) AS score
        |  FROM tok),
        |r AS (
        |  SELECT doc_id, source, n_tokens, score,
        |    CAST(row_number() OVER (PARTITION BY source
        |                            ORDER BY score, doc_id) AS BIGINT) AS rnk,
        |    count(*) OVER (PARTITION BY source) AS n_src
        |  FROM s)
        |SELECT doc_id, source, n_tokens, score, rnk,
        |  rnk * 4 > n_src AS keep
        |FROM r ORDER BY doc_id""".stripMargin,

    // x58/x73/x75 run the k∝corpus deployment discipline (cells =
    // ceil(fit-rows / 500), derivedKSql == the engine's corpusK) —
    // round-10 verdict task #5: the demos now scale their cell count
    // with the data instead of freezing the sf0.01 constant.
    "x58_semdedup" -> semDedupSql(derivedKSql("pts"), dims = 64),

    "x59_pq_adc" ->
      pqAdcSql(m = 4, sub = 16, k = 16, topK = 5, nQueries = 20),

    "x60_ngram_novelty" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 10000, text FROM documents),
        |tok AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM corpus),
        |wins AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [md5(array_to_string(t[i+1 : i+5], ' '))
        |     for i in range(0, greatest(CAST(len(t) AS BIGINT) - 4, 0))]))
        |    AS h
        |  FROM tok WHERE len(t) >= 5),
        |fo AS (SELECT h, min(doc_id) AS first_doc FROM wins GROUP BY h),
        |scored AS (
        |  SELECT doc_id,
        |    CAST(count(*) AS BIGINT) AS n_distinct_ngrams,
        |    CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_novel
        |  FROM wins JOIN fo USING (h) GROUP BY doc_id)
        |SELECT c.doc_id,
        |  coalesce(n_distinct_ngrams, 0) AS n_distinct_ngrams,
        |  coalesce(n_novel, 0) AS n_novel,
        |  coalesce(CAST(n_novel * 1000000 // n_distinct_ngrams AS BIGINT), 0)
        |    AS novelty_ppm
        |FROM corpus c LEFT JOIN scored s ON c.doc_id = s.doc_id
        |ORDER BY c.doc_id""".stripMargin,

    // x61: same derived-k treatment as x80 (the window partition count
    // is the cell count — it must scale with the corpus).
    "x61_embed_outliers" ->
      s"""WITH ${kmeans1SqlK(derivedKSql("pts"), dims = 64)},
         |r AS (
         |  SELECT vec_id, cell, round(d, 6) AS d2_6,
         |    CAST(row_number() OVER (PARTITION BY cell
         |                            ORDER BY round(d, 6) DESC, vec_id)
         |         AS BIGINT) AS rnk,
         |    rank() OVER (PARTITION BY cell
         |                 ORDER BY round(d, 6) DESC) AS trnk,
         |    count(*) OVER (PARTITION BY cell) AS pop
         |  FROM asg)
         |SELECT vec_id, CAST(cell AS BIGINT) AS cell, d2_6, rnk,
         |  CAST(pop AS BIGINT) AS pop, trnk * 20 <= pop AS outlier
         |FROM r ORDER BY vec_id""".stripMargin,

    "x62_cluster_balance" ->
      s"""WITH ${kmeans1Sql(k = 8, dims = 64)},
         |sizes AS (SELECT cell, count(*) AS pop FROM asg GROUP BY cell),
         |tot AS (SELECT CAST(sum(pop) AS BIGINT) AS total FROM sizes),
         |r AS (
         |  SELECT a.vec_id, a.cell, s.pop,
         |    least((total // 8) * 256 // s.pop, 256) AS cap256,
         |    (strpos('0123456789abcdef',
         |            substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 1)) - 1) * 16 +
         |    (strpos('0123456789abcdef',
         |            substr(md5(CAST(a.vec_id AS VARCHAR)), 2, 1)) - 1)
         |      AS bucket
         |  FROM asg a JOIN sizes s USING (cell), tot)
         |SELECT vec_id, CAST(cell AS BIGINT) AS cell,
         |  CAST(pop AS BIGINT) AS pop, CAST(cap256 AS BIGINT) AS cap256,
         |  bucket < cap256 AS keep
         |FROM r ORDER BY vec_id""".stripMargin,

    "x64_token_budget_select" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
        |    CAST(CAST(len(list_distinct(string_split_regex(text, '\s+')))
        |              AS BIGINT) * 1000000
        |         // CAST(len(string_split_regex(text, '\s+')) AS BIGINT)
        |         AS BIGINT) AS score
        |  FROM documents),
        |bysc AS (SELECT score, sum(n_tokens) AS mass FROM d GROUP BY score),
        |marked AS (
        |  SELECT score,
        |    sum(mass) OVER (ORDER BY score DESC) - mass AS cum_before,
        |    CASE WHEN sum(mass) OVER (ORDER BY score DESC) <= 10000
        |           THEN 'full'
        |         WHEN sum(mass) OVER (ORDER BY score DESC) - mass < 10000
        |           THEN 'boundary'
        |         ELSE 'out' END AS grp
        |  FROM bysc),
        |j AS (SELECT d.*, m.cum_before, m.grp FROM d JOIN marked m USING (score)),
        |bnd AS (
        |  SELECT doc_id, n_tokens, score,
        |    cum_before + sum(n_tokens) OVER (
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 10000 AS keep
        |  FROM j WHERE grp = 'boundary'),
        |rest AS (
        |  SELECT doc_id, n_tokens, score, grp = 'full' AS keep
        |  FROM j WHERE grp <> 'boundary')
        |SELECT doc_id, n_tokens, score, keep FROM bnd
        |UNION ALL
        |SELECT doc_id, n_tokens, score, keep FROM rest
        |ORDER BY doc_id""".stripMargin,

    "x63_stratified_eval" ->
      """WITH r AS (
        |  SELECT doc_id, source, lang,
        |    CAST(row_number() OVER (
        |      PARTITION BY source, lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rnk,
        |    count(*) OVER (PARTITION BY source, lang) AS pop
        |  FROM documents)
        |SELECT doc_id, source, lang, rnk, CAST(pop AS BIGINT) AS pop,
        |  CAST((pop + 19) // 20 AS BIGINT) AS quota,
        |  CASE WHEN rnk <= (pop + 19) // 20 THEN 'eval' ELSE 'train' END
        |    AS split
        |FROM r ORDER BY doc_id""".stripMargin,

    "x66_ccnet_buckets" ->
      """WITH tok AS (
        |  SELECT doc_id, lang,
        |    unnest(string_split_regex(text, '\s+')) AS token
        |  FROM documents),
        |vocab AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
        |tot AS (SELECT count(*) AS total FROM tok),
        |doc AS (
        |  SELECT doc_id, lang, count(*) AS n_tokens,
        |    CAST(sum(CAST(round(round(ln(CAST(c AS DOUBLE)
        |                                 / CAST(total AS DOUBLE)), 6) * 1e6)
        |                  AS BIGINT)) AS BIGINT) AS sum_e6
        |  FROM tok JOIN vocab USING (token), tot
        |  GROUP BY doc_id, lang),
        |scored AS (
        |  SELECT doc_id, lang, n_tokens,
        |    round(CAST(sum_e6 AS DOUBLE)
        |          / CAST(n_tokens * 1000000 AS DOUBLE), 6) AS avg_logp
        |  FROM doc),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY lang
        |                       ORDER BY avg_logp DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n_docs
        |  FROM scored)
        |SELECT doc_id, lang, n_tokens, avg_logp,
        |  CASE WHEN rn * 3 <= n_docs THEN 'head'
        |       WHEN rn * 3 <= n_docs * 2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM r ORDER BY doc_id""".stripMargin,

    "x67_prefix_filter_join" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000,
        |    array_to_string(
        |      (string_split_regex(text, '\s+'))[1:greatest(len(string_split_regex(text, '\s+')) - 3, 0)],
        |      ' ')
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM corpus),
        |sh AS (
        |  SELECT doc_id,
        |    unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                          for i in range(1, len(t) - 1)])) AS token
        |  FROM tok WHERE len(t) >= 3),
        |freq AS (SELECT token, count(*) AS df FROM sh GROUP BY token),
        |ordered AS (
        |  SELECT s.doc_id, s.token,
        |    row_number() OVER (PARTITION BY s.doc_id
        |                       ORDER BY f.df, s.token) AS ord,
        |    count(*) OVER (PARTITION BY s.doc_id) AS n
        |  FROM sh s JOIN freq f USING (token)),
        |pre AS (
        |  SELECT doc_id, token, n FROM ordered
        |  WHERE ord <= n - (3 * n + 4) // 5 + 1),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.n AS na, b.n AS nb
        |  FROM pre a JOIN pre b
        |    ON a.token = b.token AND a.doc_id < b.doc_id
        |  WHERE least(a.n, b.n) * 5 >= greatest(a.n, b.n) * 3),
        |ix AS (
        |  SELECT c.doc_a, c.doc_b, c.na, c.nb, count(*) AS inter
        |  FROM cand c
        |  JOIN sh ta ON ta.doc_id = c.doc_a
        |  JOIN sh tb ON tb.doc_id = c.doc_b AND tb.token = ta.token
        |  GROUP BY c.doc_a, c.doc_b, c.na, c.nb)
        |SELECT doc_a, doc_b, inter,
        |  round(CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE), 4)
        |    AS jaccard
        |FROM ix
        |WHERE inter * 5 >= (na + nb - inter) * 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    "x68_temporal_split" ->
      """WITH r AS (
        |  SELECT event_id, user_id, ts,
        |    CAST(row_number() OVER (
        |      PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS BIGINT) AS rn_desc,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events)
        |SELECT event_id, user_id, ts,
        |  CASE WHEN rn_desc <= (n + 4) // 5 THEN 'test' ELSE 'train' END
        |    AS split
        |FROM r ORDER BY event_id""".stripMargin,

    "x69_zipf_slope" ->
      """WITH tok AS (
        |  SELECT unnest(string_split_regex(text, '\s+')) AS token
        |  FROM documents),
        |vocab AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
        |ranked AS (
        |  SELECT c, row_number() OVER (ORDER BY c DESC, token) AS rn
        |  FROM vocab),
        |pts AS (
        |  SELECT
        |    CAST(round(round(ln(CAST(rn AS DOUBLE)), 6) * 1e6) AS BIGINT)
        |      AS x6,
        |    CAST(round(round(ln(CAST(c AS DOUBLE)), 6) * 1e6) AS BIGINT)
        |      AS y6
        |  FROM ranked),
        |s AS (
        |  SELECT count(*) AS n_points,
        |    sum(CAST(x6 AS HUGEINT)) AS sx,
        |    sum(CAST(y6 AS HUGEINT)) AS sy,
        |    sum(CAST(x6 * y6 AS HUGEINT)) AS sxy,
        |    sum(CAST(x6 * x6 AS HUGEINT)) AS sxx
        |  FROM pts)
        |SELECT n_points,
        |  round(CAST(n_points * sxy - sx * sy AS DOUBLE)
        |        / CAST(n_points * sxx - sx * sx AS DOUBLE), 4) AS zipf_slope
        |FROM s""".stripMargin,

    "x70_graph_pagerank" -> {
      // 5 unrolled integer-PageRank iterations; each round is the same
      // join+sum text, generated here so the Spark loop and the oracle
      // cannot drift in round count or damping arithmetic
      val rounds = (1 to 5).map { i =>
        s"""r$i AS (
           |  SELECT e.dst AS node,
           |    CAST(150000 + (850 * sum(r.rank // d.deg)) // 1000
           |         AS BIGINT) AS rank
           |  FROM r${i - 1} r
           |  JOIN deg d ON d.node = r.node
           |  JOIN e ON e.src = r.node
           |  GROUP BY e.dst)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (
         |  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM lineitem),
         |e AS (SELECT src, dst FROM e0
         |      UNION ALL SELECT dst, src FROM e0),
         |deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY src),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM deg),
         |$rounds
         |SELECT
         |  CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END
         |    AS node_type,
         |  node // 2 AS key, deg, rank
         |FROM r5 JOIN deg USING (node)
         |ORDER BY node_type, key""".stripMargin
    },

    "x71_gopher_rules" ->
      s"""SELECT doc_id,
         |  len(string_split_regex(text, '\\s+')) AS n_words,
         |  (CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)
         |   * 100) // len(string_split_regex(text, '\\s+')) AS mwl100,
         |  CAST(len(list_filter(string_split_regex(text, '\\s+'),
         |                       x -> x IN ($stoplistSql))) AS BIGINT)
         |    AS stop_count,
         |  (CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
         |        AS BIGINT) * 1000000)
         |    // greatest(CAST(length(text) AS BIGINT), 1) AS sym_ppm,
         |  (len(string_split_regex(text, '\\s+')) BETWEEN 50 AND 100000)
         |    AND ((CAST(length(regexp_replace(text, '\\s', '', 'g'))
         |              AS BIGINT) * 100)
         |         // len(string_split_regex(text, '\\s+')) BETWEEN 300 AND 1000)
         |    AND (CAST(len(list_filter(string_split_regex(text, '\\s+'),
         |                              x -> x IN ($stoplistSql))) AS BIGINT) >= 2)
         |    AND ((CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
         |               AS BIGINT) * 1000000)
         |         // greatest(CAST(length(text) AS BIGINT), 1) <= 100000) AS pass
         |FROM documents
         |ORDER BY doc_id""".stripMargin,

    "x72_ivfpq_ann" ->
      ivfPqSql(kc = 8, dims = 64, m = 4, sub = 16, kq = 16,
        nProbe = 2, topK = 5, nQueries = 20),

    // x73: kmeans1Sql's assignment, within-cell self-join, per-source
    // rank over integer micro-unit distances (floor(d2*1e6 + 0.5) —
    // pure IEEE arithmetic, matching Spark bit-for-bit).
    "x73_knn_graph" -> {
      val d2 = "list_sum([(pa.v[i] - pb.v[i]) * (pa.v[i] - pb.v[i]) " +
        "for i in range(1, 65)])"
      s"""WITH ${kmeans1SqlK(derivedKSql("pts"), dims = 64)},
         |edges AS (
         |  SELECT a.vec_id AS src_id, b.vec_id AS neighbor_id,
         |    CAST(floor($d2 * 1000000.0 + 0.5) AS BIGINT) AS d2_e6
         |  FROM asg a JOIN asg b USING (cell)
         |  JOIN pts pa ON a.vec_id = pa.vec_id
         |  JOIN pts pb ON b.vec_id = pb.vec_id
         |  WHERE a.vec_id <> b.vec_id)
         |SELECT src_id, rnk, neighbor_id, d2_e6 FROM (
         |  SELECT src_id, neighbor_id, d2_e6,
         |    CAST(row_number() OVER (PARTITION BY src_id
         |                            ORDER BY d2_e6, neighbor_id) AS BIGINT)
         |      AS rnk
         |  FROM edges)
         |WHERE rnk <= 5
         |ORDER BY src_id, rnk""".stripMargin
    },

    // x74: three unrolled merge rounds; the winning pair is the global
    // (count desc, packed-pair asc) argmax with U+0001 packing so the
    // string order equals (a, b) tuple order; rebuilds are pure list
    // comprehensions — with a <> b occurrences can't overlap, so
    // per-element rewrite is exact.
    "x74_bpe_merges" -> {
      def round(prev: String, cur: Int): String =
        s"""p_$cur AS (
           |  SELECT unnest([toks[i] || chr(1) || toks[i+1]
           |                 for i in range(1, len(toks))
           |                 if toks[i] <> toks[i+1]]) AS ab
           |  FROM $prev),
           |m_$cur AS (
           |  SELECT string_split(ab, chr(1))[1] AS ma,
           |         string_split(ab, chr(1))[2] AS mb
           |  FROM (SELECT ab, count(*) AS c FROM p_$cur GROUP BY ab)
           |  ORDER BY c DESC, ab LIMIT 1),
           |t_$cur AS (
           |  SELECT doc_id, n_before,
           |    [CASE WHEN toks[i] = m.ma AND i < len(toks)
           |               AND toks[i+1] = m.mb
           |          THEN m.ma || '_' || m.mb ELSE toks[i] END
           |     for i in range(1, len(toks) + 1)
           |     if NOT (i > 1 AND toks[i-1] = m.ma AND toks[i] = m.mb)]
           |      AS toks,
           |    ${(1 to cur).map(j => s"merge_$j").mkString(", ")}
           |  FROM $prev, (SELECT ma, mb, ma || '_' || mb AS merge_$cur
           |               FROM m_$cur) m)""".stripMargin
      s"""WITH t_0 AS (
         |  SELECT doc_id,
         |    string_split_regex(text, '\\s+') AS toks,
         |    CAST(len(string_split_regex(text, '\\s+')) AS BIGINT)
         |      AS n_before
         |  FROM documents),
         |${round("t_0", 1)},
         |${round("t_1", 2)},
         |${round("t_2", 3)}
         |SELECT doc_id, n_before,
         |  CAST(len(toks) AS BIGINT) AS n_after,
         |  list_aggregate(toks, 'string_agg', ' ') AS text_merged,
         |  merge_1, merge_2, merge_3
         |FROM t_3
         |ORDER BY doc_id""".stripMargin
    },

    // x75: the frozen-index incremental-maintenance identity — fit on
    // the old corpus only (fitWhere), assign everything, then run the
    // FULL x73-shaped recompute RESTRICTED to cells the new batch
    // touched. Row-identity with the Spark incremental path proves the
    // batch probe loses nothing.
    "x75_incremental_knn" -> {
      val d2 = "list_sum([(pa.v[i] - pb.v[i]) * (pa.v[i] - pb.v[i]) " +
        "for i in range(1, 65)])"
      s"""WITH ${kmeans1SqlK(derivedKSql("pts WHERE vec_id % 10 <> 0"),
        dims = 64, fitWhere = "vec_id % 10 <> 0")},
         |touched AS (
         |  SELECT DISTINCT cell FROM asg WHERE vec_id % 10 = 0),
         |edges AS (
         |  SELECT a.vec_id AS src_id, b.vec_id AS neighbor_id,
         |    CAST(floor($d2 * 1000000.0 + 0.5) AS BIGINT) AS d2_e6
         |  FROM asg a JOIN asg b ON a.cell = b.cell
         |  JOIN pts pa ON a.vec_id = pa.vec_id
         |  JOIN pts pb ON b.vec_id = pb.vec_id
         |  WHERE a.vec_id <> b.vec_id
         |    AND a.cell IN (SELECT cell FROM touched))
         |SELECT src_id, rnk, neighbor_id, d2_e6 FROM (
         |  SELECT src_id, neighbor_id, d2_e6,
         |    CAST(row_number() OVER (PARTITION BY src_id
         |                            ORDER BY d2_e6, neighbor_id) AS BIGINT)
         |      AS rnk
         |  FROM edges)
         |WHERE rnk <= 5
         |ORDER BY src_id, rnk""".stripMargin
    },

    // x76: same 2^16-slot / 4-hash Bloom construction — position i of
    // a gram is the first 4 hex chars of md5(i || ':' || gram) — so
    // filter contents, every membership verdict AND every false
    // positive reproduce bit-for-bit.
    "x76_bloom_decontaminate" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    unnest(list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |                          || ' ' || tk[i+3] || ' ' || tk[i+4]
        |                          for i in range(1, len(tk) - 3)])) AS gram
        |  FROM tok WHERE len(tk) >= 5),
        |refv AS (
        |  SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0),
        |bits AS (
        |  SELECT DISTINCT substr(md5(CAST(r.i AS VARCHAR) || ':' || gram), 1, 4)
        |    AS pos
        |  FROM refv, range(1, 5) r(i)),
        |probes AS (
        |  SELECT g.doc_id, g.gram,
        |    substr(md5(CAST(r.i AS VARCHAR) || ':' || g.gram), 1, 4) AS pos
        |  FROM g, range(1, 5) r(i)),
        |verdict AS (
        |  SELECT p.doc_id, p.gram,
        |    (CAST(sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      = 4) AS bloom_hit
        |  FROM probes p LEFT JOIN bits b USING (pos)
        |  GROUP BY p.doc_id, p.gram),
        |agg AS (
        |  SELECT v.doc_id, count(*) AS n_grams,
        |    CAST(sum(CASE WHEN v.bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_bloom,
        |    CAST(sum(CASE WHEN rv.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_exact
        |  FROM verdict v LEFT JOIN refv rv USING (gram)
        |  GROUP BY v.doc_id)
        |SELECT doc_id, n_grams, n_bloom, n_exact,
        |  n_bloom - n_exact AS n_fp,
        |  round(CAST(n_bloom AS DOUBLE) / CAST(n_grams AS DOUBLE), 4)
        |    AS bloom_ratio,
        |  (round(CAST(n_bloom AS DOUBLE) / CAST(n_grams AS DOUBLE), 4) >= 0.5)
        |    AS flagged
        |FROM agg ORDER BY doc_id""".stripMargin,

    // x77: registers rebuilt from the same 32-bit md5 hash (6 index
    // bits / 26 pattern bits); the register sum travels as the exact
    // integer Σ 2^(27−M_j) so the single division is the only rounding
    // point; the raw-estimate numerator constant is interpolated from
    // the one Scala double both sides share.
    "x77_hll_distinct" ->
      s"""WITH tok AS (
        |  SELECT lang, string_split_regex(text, '\\s+') AS tk FROM documents),
        |g AS (
        |  SELECT lang,
        |    unnest(list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |                          for i in range(1, len(tk) - 1)])) AS gram
        |  FROM tok WHERE len(tk) >= 3),
        |h AS (
        |  SELECT lang,
        |    CAST(list_sum([(strpos('0123456789abcdef', substr(md5(gram), i, 1))
        |                    - 1) * CAST(pow(16, 8 - i) AS BIGINT)
        |                   for i in range(1, 9)]) AS BIGINT) AS h32
        |  FROM g),
        |regs AS (
        |  SELECT lang, h32 // 67108864 AS idx,
        |    max(CASE WHEN h32 % 67108864 = 0 THEN 27
        |             ELSE 27 - length(bin(h32 % 67108864)) END) AS m_rho
        |  FROM h GROUP BY lang, idx),
        |sk AS (
        |  SELECT lang, count(*) AS n_regs,
        |    CAST(sum(1::BIGINT << CAST(27 - m_rho AS INT)) AS BIGINT)
        |      AS s_present
        |  FROM regs GROUP BY lang),
        |s2 AS (
        |  SELECT lang, CAST(64 - n_regs AS BIGINT) AS v_zero,
        |    CAST(s_present + (64 - n_regs) * 134217728 AS BIGINT) AS s_int
        |  FROM sk),
        |ex AS (
        |  SELECT lang, count(DISTINCT gram) AS exact_distinct FROM g
        |  GROUP BY lang),
        |est AS (
        |  SELECT e.lang, e.exact_distinct, s.v_zero, s.s_int,
        |    round(CASE WHEN ${Hll.RawNumerator} / CAST(s.s_int AS DOUBLE)
        |                    <= 160.0 AND s.v_zero > 0
        |      THEN 64.0 * ln(64.0 / CAST(s.v_zero AS DOUBLE))
        |      ELSE ${Hll.RawNumerator} / CAST(s.s_int AS DOUBLE) END, 4)
        |      AS hll_estimate
        |  FROM ex e JOIN s2 s USING (lang))
        |SELECT lang, exact_distinct, v_zero, s_int, hll_estimate,
        |  round((hll_estimate - CAST(exact_distinct AS DOUBLE))
        |        / CAST(exact_distinct AS DOUBLE), 4) AS rel_err
        |FROM est ORDER BY lang""".stripMargin,

    // x78: bigrams as 'a b' strings (whitespace tokens can't contain
    // spaces, so split_part inverts exactly); min-count prune before
    // the unigram joins; one integer-exact division then ln, quantized
    // to 6 decimals before ranking.
    "x78_pmi_collocations" ->
      """WITH tok AS (
        |  SELECT string_split_regex(text, '\s+') AS tk FROM documents),
        |uc AS (
        |  SELECT w, count(*) AS c_w
        |  FROM (SELECT unnest(tk) AS w FROM tok) GROUP BY w),
        |nu AS (SELECT CAST(sum(c_w) AS BIGINT) AS n_uni FROM uc),
        |bg AS (
        |  SELECT unnest([tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))])
        |    AS gram
        |  FROM tok WHERE len(tk) >= 2),
        |bc AS (
        |  SELECT split_part(gram, ' ', 1) AS a, split_part(gram, ' ', 2) AS b,
        |    count(*) AS c_ab
        |  FROM bg GROUP BY 1, 2),
        |nb AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_bi FROM bc),
        |sc AS (
        |  SELECT bc.a, bc.b, bc.c_ab, ua.c_w AS c_a, ub.c_w AS c_b,
        |    round(ln(CAST(bc.c_ab * nu.n_uni * nu.n_uni AS DOUBLE)
        |             / CAST(nb.n_bi * ua.c_w * ub.c_w AS DOUBLE)), 6) AS pmi6
        |  FROM bc
        |  JOIN uc ua ON bc.a = ua.w
        |  JOIN uc ub ON bc.b = ub.w, nu, nb
        |  WHERE bc.c_ab >= 5),
        |r AS (
        |  SELECT a, b, c_ab, c_a, c_b, pmi6,
        |    CAST(row_number() OVER (ORDER BY pmi6 DESC, a, b) AS BIGINT) AS rnk
        |  FROM sc)
        |SELECT rnk, a, b, c_ab, c_a, c_b, pmi6
        |FROM r WHERE rnk <= 20 ORDER BY rnk""".stripMargin,

    // x79: query = top-3 df terms; conjunctive match via
    // count(distinct term) == 3 over the term-filtered postings.
    "x79_boolean_retrieval" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |tfv AS (
        |  SELECT doc_id, w, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(tk) AS w FROM tok) GROUP BY 1, 2),
        |dfv AS (SELECT w, count(*) AS df FROM tfv GROUP BY w),
        |terms AS (
        |  SELECT w FROM (
        |    SELECT w, row_number() OVER (ORDER BY df DESC, w) AS r FROM dfv)
        |  WHERE r <= 3),
        |h AS (
        |  SELECT t.doc_id, count(DISTINCT t.w) AS n_terms,
        |    CAST(sum(t.tf) AS BIGINT) AS total_tf
        |  FROM tfv t JOIN terms USING (w) GROUP BY t.doc_id),
        |r AS (
        |  SELECT doc_id, total_tf,
        |    CAST(row_number() OVER (ORDER BY total_tf DESC, doc_id) AS BIGINT)
        |      AS rnk
        |  FROM h WHERE n_terms = 3)
        |SELECT rnk, doc_id, total_tf FROM r WHERE rnk <= 20
        |ORDER BY rnk""".stripMargin,

    // x80: same frozen 1-iteration quantized k-means assignment
    // (kmeans1Sql), masked/voter split by vec_id % 5, within-cell
    // micro-unit distances, top-5 labeled neighbors, majority vote
    // with ties to the lowest label.
    // x80: cell count = the same ceil(n/500) scalar subquery the
    // engine's corpusK computes (round-16, closing the fixed-16 cell
    // quadratic the sized-heap cohort caught).
    "x80_label_propagation" -> {
      val d2 = "list_sum([(pa.v[i] - pb.v[i]) * (pa.v[i] - pb.v[i]) " +
        "for i in range(1, 65)])"
      s"""WITH ${kmeans1SqlK(derivedKSql("pts"), dims = 64)},
         |lbl AS (SELECT vec_id, label FROM embeddings),
         |m AS (
         |  SELECT a.vec_id AS src_id, a.cell, l.label AS true_label
         |  FROM asg a JOIN lbl l USING (vec_id) WHERE a.vec_id % 5 = 0),
         |vt AS (
         |  SELECT a.vec_id AS neighbor_id, a.cell, l.label AS voter_label
         |  FROM asg a JOIN lbl l USING (vec_id) WHERE a.vec_id % 5 <> 0),
         |e AS (
         |  SELECT m.src_id, m.true_label, v.neighbor_id, v.voter_label,
         |    CAST(floor($d2 * 1000000.0 + 0.5) AS BIGINT) AS d2_e6
         |  FROM m JOIN vt v ON m.cell = v.cell
         |  JOIN pts pa ON m.src_id = pa.vec_id
         |  JOIN pts pb ON v.neighbor_id = pb.vec_id),
         |r AS (
         |  SELECT src_id, true_label, voter_label,
         |    row_number() OVER (PARTITION BY src_id
         |                       ORDER BY d2_e6, neighbor_id) AS rnk
         |  FROM e),
         |votes AS (
         |  SELECT src_id, true_label, voter_label, count(*) AS n_votes
         |  FROM r WHERE rnk <= 5 GROUP BY 1, 2, 3),
         |win AS (
         |  SELECT src_id, true_label, voter_label, n_votes,
         |    row_number() OVER (PARTITION BY src_id
         |                       ORDER BY n_votes DESC, voter_label) AS vr
         |  FROM votes)
         |SELECT src_id, true_label, voter_label AS predicted_label,
         |  CAST(n_votes AS BIGINT) AS n_votes,
         |  (voter_label = true_label) AS correct
         |FROM win WHERE vr = 1 ORDER BY src_id""".stripMargin
    },

    // x81: identical A-ES key arithmetic — md5-derived u, ln quantized
    // to 8 BEFORE the weight division, key to 12 — so the sample
    // membership itself is the thing being oracle-checked.
    "x81_weighted_sample" ->
      """WITH d AS (
        |  SELECT source, doc_id, n_chars,
        |    round(round(ln(
        |      (CAST(list_sum([(strpos('0123456789abcdef',
        |                       substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)
        |                      * CAST(pow(16, 8 - i) AS BIGINT)
        |                      for i in range(1, 9)]) AS DOUBLE) + 1.0)
        |      / 4294967296.0), 8) / CAST(n_chars AS DOUBLE), 12) AS key12
        |  FROM documents WHERE n_chars > 0),
        |r AS (
        |  SELECT source, doc_id, n_chars, key12,
        |    CAST(row_number() OVER (PARTITION BY source
        |                            ORDER BY key12 DESC, doc_id) AS BIGINT)
        |      AS rnk
        |  FROM d)
        |SELECT source, rnk, doc_id, n_chars, key12
        |FROM r WHERE rnk <= 10 ORDER BY source, rnk""".stripMargin,

    // x82: both power iterations recomputed in SQL — v0 = 1/sqrt(d)
    // exactly, per-vector contributions quantized to the 2^-24 grid
    // and integer-summed per dimension, the same 64-term norm fold —
    // so the direction Spark's driver computed is re-derived, not
    // trusted.
    "x82_power_iteration" -> powerIterSql(dims = 64, iters = 2),

    // x84: same opening-trigram blocking and distinct-trigram
    // intersection; both engines' set-intersect sizes agree because
    // both input arrays are distinct.
    "x84_containment_join" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |d AS (
        |  SELECT doc_id,
        |    list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |                   for i in range(1, len(tk) - 1)]) AS tri
        |  FROM tok WHERE len(tk) >= 3),
        |q AS (
        |  SELECT doc_id + 20000 AS quote_id,
        |    list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |                   for i in range(1, 29)]) AS qtri,
        |    tk[1] || ' ' || tk[2] || ' ' || tk[3] AS block
        |  FROM tok WHERE doc_id % 2 = 0 AND len(tk) >= 30),
        |p AS (SELECT doc_id, unnest(tri) AS block FROM d),
        |c AS (
        |  SELECT q.quote_id, p.doc_id, q.qtri, d.tri
        |  FROM q JOIN p USING (block) JOIN d ON p.doc_id = d.doc_id),
        |sc AS (
        |  SELECT quote_id, doc_id,
        |    CAST(len(qtri) AS BIGINT) AS n_q,
        |    CAST(len(list_intersect(qtri, tri)) AS BIGINT) AS n_common
        |  FROM c)
        |SELECT quote_id, doc_id, n_q, n_common,
        |  round(CAST(n_common AS DOUBLE) / CAST(n_q AS DOUBLE), 4)
        |    AS containment
        |FROM sc
        |WHERE round(CAST(n_common AS DOUBLE) / CAST(n_q AS DOUBLE), 4) >= 0.9
        |ORDER BY quote_id, doc_id""".stripMargin,

    // x86: the oracle states the shard assignment the direct way — one
    // global row_number over the seeded md5 key — which the engine must
    // reproduce through its 2-level bucketed rank.
    "x86_shard_writeout" ->
      """WITH kept AS (
        |  SELECT doc_id,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
        |      AS dr
        |  FROM documents WHERE n_chars >= 200),
        |k AS (
        |  SELECT doc_id, md5('42:' || CAST(doc_id AS VARCHAR)) AS skey
        |  FROM kept WHERE dr = 1),
        |r AS (
        |  SELECT doc_id, skey,
        |    row_number() OVER (ORDER BY skey, doc_id) - 1 AS rk
        |  FROM k)
        |SELECT doc_id, skey, rk // 100 AS shard, rk % 100 AS position
        |FROM r ORDER BY doc_id""".stripMargin,

    // x87: x72's oracle with audit=false — the exact-recall CTEs and
    // the exact_hit column are dropped; the served approx top-k stays
    // hash-checked.
    "x87_ivfpq_serve" ->
      ivfPqSql(kc = 8, dims = 64, m = 4, sub = 16, kq = 16,
        nProbe = 2, topK = 5, nQueries = 20, audit = false),

    // x88: x76's oracle without the exact-membership leg — filter
    // build, probes, verdicts, and the flag threshold all unchanged.
    "x88_bloom_serve" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    unnest(list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |                          || ' ' || tk[i+3] || ' ' || tk[i+4]
        |                          for i in range(1, len(tk) - 3)])) AS gram
        |  FROM tok WHERE len(tk) >= 5),
        |refv AS (
        |  SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0),
        |bits AS (
        |  SELECT DISTINCT substr(md5(CAST(r.i AS VARCHAR) || ':' || gram), 1, 4)
        |    AS pos
        |  FROM refv, range(1, 5) r(i)),
        |probes AS (
        |  SELECT g.doc_id, g.gram,
        |    substr(md5(CAST(r.i AS VARCHAR) || ':' || g.gram), 1, 4) AS pos
        |  FROM g, range(1, 5) r(i)),
        |verdict AS (
        |  SELECT p.doc_id, p.gram,
        |    (CAST(sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      = 4) AS bloom_hit
        |  FROM probes p LEFT JOIN bits b USING (pos)
        |  GROUP BY p.doc_id, p.gram),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_grams,
        |    CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_bloom
        |  FROM verdict GROUP BY doc_id)
        |SELECT doc_id, n_grams, n_bloom,
        |  round(CAST(n_bloom AS DOUBLE) / CAST(n_grams AS DOUBLE), 4)
        |    AS bloom_ratio,
        |  (round(CAST(n_bloom AS DOUBLE) / CAST(n_grams AS DOUBLE), 4) >= 0.5)
        |    AS flagged
        |FROM agg ORDER BY doc_id""".stripMargin,

    // x89: the same fixed-bin grid, cumulative pick, and ppm rank
    // arithmetic; the exact leg is the identical read-off at bin
    // width 1, so err is checked as a value, not a tolerance.
    "x89_quantile_histogram" ->
      """WITH h AS (
        |  SELECT n_chars // 64 AS bin, count(*) AS cnt
        |  FROM documents GROUP BY 1),
        |hv AS (
        |  SELECT n_chars AS v, count(*) AS cnt
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM h),
        |q AS (
        |  SELECT CAST(unnest([250000, 500000, 750000, 900000, 990000])
        |              AS BIGINT) AS q_ppm),
        |c AS (SELECT bin, CAST(sum(cnt) OVER (ORDER BY bin) AS BIGINT)
        |        AS cum FROM h),
        |cv AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT)
        |         AS cum FROM hv),
        |tq AS (
        |  SELECT q_ppm, n_total,
        |    (q_ppm * n_total + 999999) // 1000000 AS t
        |  FROM q, tot),
        |eb AS (
        |  SELECT tq.q_ppm, tq.n_total, tq.t, min(c.bin) AS qbin
        |  FROM tq JOIN c ON c.cum >= tq.t GROUP BY 1, 2, 3),
        |ex AS (
        |  SELECT tq.q_ppm, min(cv.v) AS exact
        |  FROM tq JOIN cv ON cv.cum >= tq.t GROUP BY 1)
        |SELECT eb.q_ppm, eb.n_total, eb.t,
        |  (eb.qbin + 1) * 64 - 1 AS est, ex.exact,
        |  (eb.qbin + 1) * 64 - 1 - ex.exact AS err
        |FROM eb JOIN ex USING (q_ppm) ORDER BY q_ppm""".stripMargin,

    // x90: identical rolling polynomial (powers of 256 mod 1e9+7
    // precomputed here so both engines share the exact constants),
    // identical cut-point construction, md5 chunk hashes.
    "x90_cdc_chunks" -> {
      val w = 8
      val M = java.math.BigInteger.valueOf(graft.ext.ContentChunks.M)
      val pows = (0 until w).map(k =>
        java.math.BigInteger.valueOf(graft.ext.ContentChunks.B)
          .modPow(java.math.BigInteger.valueOf(w - 1 - k), M)
          .longValueExact()).mkString("[", ", ", "]")
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 30000, 'INSERTED PREAMBLE ' || text
         |  FROM documents WHERE doc_id % 2 = 0),
         |b AS (
         |  SELECT doc_id, text, length(text) AS n,
         |    [i for i in range($w, length(text) + 1)
         |     if (list_sum([CAST(ascii(substr(text, i - ${w - 1} + k, 1))
         |                        AS BIGINT) * ($pows)[k + 1]
         |                   for k in range(0, $w)]) % ${graft.ext.ContentChunks.M})
         |        % ${graft.ext.ContentChunks.Mask} = 0] AS bnds
         |  FROM corpus),
         |cu AS (
         |  SELECT doc_id, text,
         |    list_sort(list_distinct(
         |      list_append(list_prepend(CAST(0 AS BIGINT),
         |        CAST(bnds AS BIGINT[])), CAST(n AS BIGINT)))) AS cuts
         |  FROM b),
         |ch AS (
         |  SELECT doc_id,
         |    md5(unnest([substr(text, CAST(cuts[i] + 1 AS INT),
         |                       CAST(cuts[i + 1] - cuts[i] AS INT))
         |                for i in range(1, len(cuts))])) AS h
         |  FROM cu),
         |nd AS (SELECT h, count(DISTINCT doc_id) AS ndocs FROM ch GROUP BY h)
         |SELECT ch.doc_id, count(*) AS n_chunks,
         |  CAST(sum(CASE WHEN nd.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_shared_chunks
         |FROM ch JOIN nd USING (h)
         |GROUP BY ch.doc_id ORDER BY ch.doc_id""".stripMargin
    },

    // x91: the oracle states AUC the direct way — one ordered cumsum
    // over the distinct-score histogram — which the engine reproduces
    // through its two-level bucketed rank; u2 is exact integer, auc6
    // one rounded division.
    "x91_auc" ->
      """WITH pts AS (
        |  SELECT CAST(floor(list_sum([x * x
        |           for x in CAST(embedding AS DOUBLE[])]) * 1000000.0
        |           + 0.5) AS BIGINT) AS s,
        |    CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS p
        |  FROM embeddings),
        |h AS (
        |  SELECT s, CAST(sum(p) AS BIGINT) AS np,
        |    CAST(sum(1 - p) AS BIGINT) AS nn
        |  FROM pts GROUP BY s),
        |c AS (
        |  SELECT s, np, nn,
        |    CAST(coalesce(sum(nn) OVER (ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cnb
        |  FROM h)
        |SELECT CAST(sum(np) AS BIGINT) AS n_pos,
        |  CAST(sum(nn) AS BIGINT) AS n_neg,
        |  CAST(sum(np * (2 * cnb + nn)) AS BIGINT) AS u2,
        |  round(CAST(sum(np * (2 * cnb + nn)) AS DOUBLE)
        |        / CAST(2 * sum(np) * sum(nn) AS DOUBLE), 6) AS auc6
        |FROM c""".stripMargin,

    // x92: the one-pass ranked rule table (count desc, packed-pair
    // asc — training's tie order), then x85's rewrite template applied
    // in rank order to the full corpus; the engines can only agree by
    // computing identical token streams (md5-verified per document).
    "x92_bpe_encode_serve" -> {
      def rewrite(src: String, out: String, m: String): String =
        s"""$out AS (
           |  SELECT doc_id,
           |    [CASE WHEN toks[i] = m.ma AND i < len(toks)
           |               AND toks[i+1] = m.mb
           |          THEN m.ma || '_' || m.mb ELSE toks[i] END
           |     for i in range(1, len(toks) + 1)
           |     if NOT (i > 1 AND toks[i-1] = m.ma AND toks[i] = m.mb)]
           |      AS toks
           |  FROM $src, $m m)""".stripMargin
      def rule(r: Int): String =
        s"""m_$r AS (
           |  SELECT string_split(ab, chr(1))[1] AS ma,
           |         string_split(ab, chr(1))[2] AS mb
           |  FROM rk WHERE r = $r)""".stripMargin
      s"""WITH t_0 AS (
         |  SELECT doc_id, string_split_regex(text, '\\s+') AS toks
         |  FROM documents),
         |pc AS (
         |  SELECT ab, count(*) AS c FROM (
         |    SELECT unnest([toks[i] || chr(1) || toks[i+1]
         |                   for i in range(1, len(toks))
         |                   if toks[i] <> toks[i+1]]) AS ab
         |    FROM t_0 WHERE doc_id % 10 = 0)
         |  GROUP BY ab),
         |rk AS (
         |  SELECT ab, row_number() OVER (ORDER BY c DESC, ab) AS r
         |  FROM pc),
         |${rule(1)},
         |${rule(2)},
         |${rule(3)},
         |${rewrite("t_0", "e_1", "m_1")},
         |${rewrite("e_1", "e_2", "m_2")},
         |${rewrite("e_2", "e_3", "m_3")}
         |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  md5(list_aggregate(toks, 'string_agg', ' ')) AS tokens_md5
         |FROM e_3
         |ORDER BY doc_id""".stripMargin
    },

    // x94: the same BM25 arithmetic stated directly — one rounded ln,
    // the exact integer rational, per-term floor to micro-units
    // BEFORE the sum so both engines add the same integers.
    "x94_bm25" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS w
        |  FROM documents),
        |p AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dlen AS (SELECT doc_id, sum(tf) AS dl FROM p GROUP BY 1),
        |tot AS (SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM dlen),
        |dft AS (SELECT w, count(*) AS df FROM p GROUP BY 1),
        |qt AS (
        |  SELECT w, df FROM (
        |    SELECT w, df, row_number() OVER (ORDER BY df DESC, w) AS trnk
        |    FROM dft)
        |  WHERE trnk <= 5),
        |sc AS (
        |  SELECT p.doc_id,
        |    CAST(floor(
        |      round(ln((t.n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0), 6)
        |      * (CAST(p.tf * 44 * t.total_dl AS DOUBLE)
        |         / CAST(p.tf * 20 * t.total_dl + 6 * t.total_dl
        |                + 18 * d.dl * t.n_docs AS DOUBLE))
        |      * 1000000.0 + 0.5) AS BIGINT) AS sc_e6
        |  FROM p JOIN qt q USING (w) JOIN dlen d USING (doc_id), tot t),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_terms,
        |    CAST(sum(sc_e6) AS BIGINT) AS score_e6
        |  FROM sc GROUP BY 1)
        |SELECT rnk, doc_id, n_terms, score_e6 FROM (
        |  SELECT CAST(row_number() OVER (ORDER BY score_e6 DESC, doc_id)
        |           AS BIGINT) AS rnk, doc_id, n_terms, score_e6
        |  FROM agg)
        |WHERE rnk <= 20
        |ORDER BY rnk""".stripMargin,

    // x97: both legs stated in their proven recipes (x94's BM25
    // integer micro-units, x03's cosine floor units), the fusion as
    // the same exact-integer 10^9 // (60 + rank) RRF — DuckDB's `//`
    // and Spark's `div` are both integer division on BIGINT, so a
    // green hash proves the fused ORDERING, not just the scores.
    "x97_hybrid_rrf" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS w
         |  FROM documents),
         |p AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dlen AS (SELECT doc_id, sum(tf) AS dl FROM p GROUP BY 1),
         |tot AS (SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM dlen),
         |dft AS (SELECT w, count(*) AS df FROM p GROUP BY 1),
         |qt AS (
         |  SELECT query_id, w, df FROM (
         |    SELECT doc_id AS query_id, w,
         |      row_number() OVER (PARTITION BY doc_id
         |                         ORDER BY tf DESC, w) AS trnk
         |    FROM p WHERE doc_id < 8) q JOIN dft USING (w)
         |  WHERE trnk <= 5),
         |sc AS (
         |  SELECT q.query_id, p.doc_id,
         |    CAST(floor(
         |      round(ln((t.n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0), 6)
         |      * (CAST(p.tf * 44 * t.total_dl AS DOUBLE)
         |         / CAST(p.tf * 20 * t.total_dl + 6 * t.total_dl
         |                + 18 * d.dl * t.n_docs AS DOUBLE))
         |      * 1000000.0 + 0.5) AS BIGINT) AS sc_e6
         |  FROM p JOIN qt q USING (w) JOIN dlen d USING (doc_id), tot t),
         |sr AS (
         |  SELECT query_id, doc_id,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score_e6 DESC, doc_id) AS BIGINT) AS r_sparse
         |  FROM (SELECT query_id, doc_id,
         |          CAST(sum(sc_e6) AS BIGINT) AS score_e6
         |        FROM sc GROUP BY 1, 2)),
         |sl AS (SELECT query_id, doc_id, r_sparse FROM sr
         |       WHERE r_sparse <= 50),
         |qv AS (SELECT vec_id AS query_id,
         |         CAST(embedding AS DOUBLE[]) AS qv
         |       FROM embeddings WHERE vec_id < 8),
         |cvt AS (SELECT vec_id AS doc_id,
         |          CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
         |ds AS (
         |  SELECT query_id, doc_id,
         |    floor(${cosineSql("qv", "cv")} * 1000000 + 0.5) AS cos_e6
         |  FROM cvt, qv),
         |dr AS (
         |  SELECT query_id, doc_id,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_e6 DESC, doc_id) AS BIGINT) AS r_dense
         |  FROM ds),
         |dl2 AS (SELECT query_id, doc_id, r_dense FROM dr
         |        WHERE r_dense <= 50),
         |fused AS (
         |  SELECT query_id, doc_id,
         |    CAST(coalesce(1000000000 // (60 + r_sparse), 0)
         |       + coalesce(1000000000 // (60 + r_dense), 0) AS BIGINT)
         |      AS rrf,
         |    CAST(coalesce(r_sparse, 0) AS BIGINT) AS r_sparse,
         |    CAST(coalesce(r_dense, 0) AS BIGINT) AS r_dense
         |  FROM sl FULL JOIN dl2 USING (query_id, doc_id))
         |SELECT query_id, rnk, doc_id, rrf, r_sparse, r_dense FROM (
         |  SELECT query_id, doc_id, rrf, r_sparse, r_dense,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY rrf DESC, doc_id) AS BIGINT) AS rnk
         |  FROM fused)
         |WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin,

    // x95: both strategies stated directly — the naive leg as ONE
    // global seeded rank (which the engine reproduces through the
    // x86 two-level bucketed form), the bucketed leg as the same
    // keyed window both engines share.
    "x95_length_bucket_pack" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |nv AS (
        |  SELECT doc_id, n_tokens,
        |    (row_number() OVER (
        |       ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id)
        |     - 1) // 32 AS batch
        |  FROM d),
        |bk AS (
        |  SELECT doc_id, n_tokens,
        |    (n_tokens // 64) * 1000000 +
        |    (row_number() OVER (PARTITION BY n_tokens // 64
        |       ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id)
        |     - 1) // 32 AS batch
        |  FROM d),
        |an AS (SELECT batch, count(*) AS n, max(n_tokens) AS mx,
        |         sum(n_tokens) AS rl FROM nv GROUP BY 1),
        |ab AS (SELECT batch, count(*) AS n, max(n_tokens) AS mx,
        |         sum(n_tokens) AS rl FROM bk GROUP BY 1),
        |s AS (
        |  SELECT 'seeded_order' AS strategy,
        |    CAST(count(*) AS BIGINT) AS n_batches,
        |    CAST(sum(rl) AS BIGINT) AS real_tokens,
        |    CAST(sum(mx * n) AS BIGINT) AS padded_tokens
        |  FROM an
        |  UNION ALL
        |  SELECT 'length_bucketed',
        |    CAST(count(*) AS BIGINT), CAST(sum(rl) AS BIGINT),
        |    CAST(sum(mx * n) AS BIGINT)
        |  FROM ab)
        |SELECT strategy, n_batches, real_tokens, padded_tokens,
        |  (padded_tokens - real_tokens) * 1000000 // padded_tokens
        |    AS waste_ppm
        |FROM s
        |ORDER BY strategy""".stripMargin,

    // x93: every row's interleaved key recomputed bit-exactly (the
    // x41 normalize/interleave arithmetic — floor-before-BIGINT
    // because DuckDB's double→int cast rounds where Spark truncates),
    // ordered by it so the oracle pays its own full layout sort in
    // the same session.
    "x93_zorder_write" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS od
        |  FROM orders),
        |b AS (SELECT min(o_custkey) AS cmin, max(o_custkey) AS cmax,
        |             min(od) AS dmin, max(od) AS dmax FROM o),
        |n AS (
        |  SELECT o_orderkey, o_custkey, od,
        |    CASE WHEN cmax = cmin THEN 0
        |         ELSE CAST(floor((o_custkey - cmin) * 255.0
        |                         / (cmax - cmin)) AS BIGINT)
        |    END AS nx,
        |    CASE WHEN dmax = dmin THEN 0
        |         ELSE CAST(floor((od - dmin) * 255.0
        |                         / (dmax - dmin)) AS BIGINT)
        |    END AS ny
        |  FROM o, b)
        |SELECT o_orderkey, o_custkey, od,
        |  CAST(list_sum([(((nx >> i) & 1) << (2*i + 1))
        |                 + (((ny >> i) & 1) << (2*i))
        |                 for i in range(0, 8)]) AS BIGINT) AS z
        |FROM n
        |ORDER BY z, o_orderkey""".stripMargin,

    // x83: the composed gate, assembled from the same SQL pieces as
    // x71 (quality), x01 (dedup window), x76 (bloom bits + verdicts),
    // x81 (A-ES key), x19 (pack cumsum) — conditional window
    // partitions mirror the Spark side exactly.
    "x83_pipeline_gate" -> {
      val gram5 = "list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || " +
        "tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4] " +
        "for i in range(1, len(tk) - 3)])"
      s"""WITH base AS (
         |  SELECT doc_id, text, lang, source, n_chars FROM documents),
         |corpus AS (
         |  SELECT * FROM base
         |  UNION ALL
         |  SELECT doc_id + 10000 AS doc_id, text, lang, source, n_chars
         |  FROM base),
         |q AS (
         |  SELECT doc_id, text, lang, source, n_chars,
         |    md5(text) AS content_md5,
         |    CAST(len(string_split_regex(text, '\\s+')) AS BIGINT)
         |      AS n_words,
         |    (CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)
         |     * 100) // len(string_split_regex(text, '\\s+')) AS mwl100,
         |    CAST(len(list_filter(string_split_regex(text, '\\s+'),
         |                         x -> x IN ($stoplistSql))) AS BIGINT)
         |      AS stop_count,
         |    (CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
         |          AS BIGINT) * 1000000)
         |      // greatest(CAST(length(text) AS BIGINT), 1) AS sym_ppm
         |  FROM corpus),
         |q2 AS (
         |  SELECT *,
         |    (n_words BETWEEN 50 AND 100000)
         |      AND (mwl100 BETWEEN 300 AND 1000)
         |      AND stop_count >= 2 AND sym_ppm <= 100000 AS q_pass
         |  FROM q),
         |d AS (
         |  SELECT *, row_number() OVER (PARTITION BY q_pass, content_md5
         |                               ORDER BY doc_id) AS dup_rank
         |  FROM q2),
         |refg AS (
         |  SELECT DISTINCT unnest($gram5) AS gram
         |  FROM (SELECT string_split_regex(text, '\\s+') AS tk
         |        FROM base WHERE doc_id % 17 = 0)
         |  WHERE len(tk) >= 5),
         |bits AS (
         |  SELECT DISTINCT
         |    substr(md5(CAST(r.i AS VARCHAR) || ':' || gram), 1, 4) AS pos
         |  FROM refg, range(1, 5) r(i)),
         |sg AS (
         |  SELECT doc_id, unnest($gram5) AS gram
         |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS tk
         |        FROM d WHERE q_pass AND dup_rank = 1)),
         |probes AS (
         |  SELECT sg.doc_id, sg.gram,
         |    substr(md5(CAST(r.i AS VARCHAR) || ':' || sg.gram), 1, 4) AS pos
         |  FROM sg, range(1, 5) r(i)),
         |verdict AS (
         |  SELECT p.doc_id, p.gram,
         |    (CAST(sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END)
         |       AS BIGINT) = 4) AS bloom_hit
         |  FROM probes p LEFT JOIN bits b USING (pos)
         |  GROUP BY p.doc_id, p.gram),
         |ratio AS (
         |  SELECT doc_id,
         |    round(CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END)
         |            AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
         |      AS contam_ratio
         |  FROM verdict GROUP BY doc_id),
         |e AS (
         |  SELECT d.*,
         |    coalesce(r.contam_ratio, 0.0) >= 0.5 AS contam,
         |    q_pass AND dup_rank = 1
         |      AND NOT (coalesce(r.contam_ratio, 0.0) >= 0.5) AS eligible
         |  FROM d LEFT JOIN ratio r USING (doc_id)),
         |s AS (
         |  SELECT *,
         |    round(round(ln(
         |      (CAST(list_sum([(strpos('0123456789abcdef',
         |                       substr(md5(CAST(doc_id AS VARCHAR)), i, 1))
         |                       - 1) * CAST(pow(16, 8 - i) AS BIGINT)
         |                      for i in range(1, 9)]) AS DOUBLE) + 1.0)
         |      / 4294967296.0), 8)
         |      / CAST(greatest(n_chars, 1) AS DOUBLE), 12) AS key12
         |  FROM e),
         |s2 AS (
         |  SELECT *, row_number() OVER (PARTITION BY eligible, source
         |                               ORDER BY key12 DESC, doc_id)
         |    AS s_rank
         |  FROM s),
         |s3 AS (SELECT *, eligible AND s_rank <= 10 AS kept FROM s2),
         |p AS (
         |  SELECT *,
         |    CAST(sum(n_words) OVER (
         |      PARTITION BY kept, source, lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      - n_words AS tok_offset
         |  FROM s3)
         |SELECT doc_id,
         |  CASE WHEN NOT q_pass THEN 'quality'
         |       WHEN dup_rank > 1 THEN 'dup'
         |       WHEN contam THEN 'contam'
         |       WHEN s_rank > 10 THEN 'sample'
         |       ELSE 'kept' END AS stage,
         |  CASE WHEN kept THEN n_words END AS n_tokens,
         |  CASE WHEN kept THEN tok_offset END AS tok_offset,
         |  CASE WHEN kept THEN CAST(floor(tok_offset / 512) AS BIGINT) END
         |    AS first_chunk,
         |  CASE WHEN kept THEN
         |    CAST(floor((tok_offset + greatest(n_words, 1) - 1) / 512)
         |      AS BIGINT)
         |    - CAST(floor(tok_offset / 512) AS BIGINT) + 1 END AS n_chunks
         |FROM p ORDER BY doc_id""".stripMargin
    },

    "x98_weighted_minhash" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000,
         |    array_to_string(
         |      (string_split_regex(text, '\\s+'))
         |        [1:len(string_split_regex(text, '\\s+')) - 3], ' ')
         |      || ' $Boilerplate'
         |  FROM documents),
         |tok AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t
         |        FROM corpus),
         |sh AS (
         |  SELECT doc_id,
         |    list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
         |                   for i in range(1, len(t) - 1)]) AS s
         |  FROM tok WHERE len(t) >= 3),
         |ex AS (SELECT doc_id, unnest(s) AS w FROM sh),
         |dfq AS (SELECT w, count(*) AS df FROM ex GROUP BY w),
         |wts AS (
         |  SELECT ex.doc_id, ex.w,
         |    CASE WHEN df = 1 THEN 4 WHEN df <= 3 THEN 3
         |         WHEN df <= 8 THEN 2 WHEN df <= 64 THEN 1
         |         ELSE 0 END AS wt
         |  FROM ex JOIN dfq USING (w)),
         |expd AS (
         |  SELECT doc_id,
         |    flatten(list([w || '~' || CAST(i AS VARCHAR)
         |                  for i in range(1, wt + 1)])) AS exp
         |  FROM wts WHERE wt > 0 GROUP BY doc_id),
         |sig AS (
         |  SELECT e.doc_id, s.s, e.exp,
         |    [list_min([substr(md5(x || '#' || CAST(h // 4 AS VARCHAR)),
         |                      CAST(1 + 8 * (h % 4) AS INT), 8)
         |               for x in e.exp])
         |     for h in range(0, 16)] AS g
         |  FROM expd e JOIN sh s USING (doc_id)),
         |bands AS (
         |  SELECT doc_id, b,
         |    md5(g[4*b+1] || g[4*b+2] || g[4*b+3] || g[4*b+4]) AS bh
         |  FROM sig, range(0, 4) r(b)),
         |cand AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |v AS (
         |  SELECT doc_a, doc_b,
         |    len(list_intersect(ea.exp, eb.exp)) AS wmin,
         |    len(ea.exp) + len(eb.exp)
         |      - len(list_intersect(ea.exp, eb.exp)) AS wuni,
         |    len(list_intersect(sa.s, sb.s)) AS inter,
         |    len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)) AS uni
         |  FROM cand
         |  JOIN expd ea ON ea.doc_id = doc_a
         |  JOIN expd eb ON eb.doc_id = doc_b
         |  JOIN sh sa ON sa.doc_id = doc_a
         |  JOIN sh sb ON sb.doc_id = doc_b)
         |SELECT doc_a, doc_b, wmin, wuni, inter, uni,
         |  1000000 * wmin // wuni AS jw_ppm,
         |  1000000 * inter // uni AS j_ppm
         |FROM v WHERE 1000000 * wmin // wuni >= 250000
         |ORDER BY doc_a, doc_b""".stripMargin,

    "x99_data_recipe" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_toks
        |  FROM documents
        |  WHERE (doc_id // 20) % 10 < 1 + CAST(substr(source, 4) AS INT) % 10),
        |s AS (
        |  SELECT source, CAST(sum(n_toks) AS BIGINT) AS src_toks
        |  FROM d GROUP BY source),
        |t AS (SELECT CAST(sum(src_toks) AS BIGINT) AS corpus_toks FROM s),
        |wts AS (
        |  SELECT source, src_toks,
        |    CAST(round(round(pow(CAST(greatest(
        |      (src_toks * 1000000) // corpus_toks, 1) AS DOUBLE), 0.7), 6)
        |      * 1e6) AS BIGINT) AS w_e6,
        |    corpus_toks
        |  FROM s, t),
        |tw AS (SELECT CAST(sum(w_e6) AS BIGINT) AS total_w FROM wts),
        |p AS (
        |  SELECT source, src_toks,
        |    (w_e6 * 1000000) // total_w AS share_ppm,
        |    corpus_toks AS budget
        |  FROM wts, tw),
        |p2 AS (
        |  SELECT source, src_toks, share_ppm,
        |    (budget // 1000000) * share_ppm
        |      + ((budget % 1000000) * share_ppm) // 1000000 AS target_toks
        |  FROM p),
        |p3 AS (
        |  SELECT source, src_toks, share_ppm, target_toks,
        |    (target_toks + src_toks - 1) // src_toks AS repeat_factor,
        |    target_toks
        |      - ((target_toks + src_toks - 1) // src_toks - 1) * src_toks
        |      AS remainder
        |  FROM p2),
        |cum AS (
        |  SELECT d.source, d.doc_id, d.n_toks, p3.repeat_factor,
        |    p3.remainder,
        |    coalesce(sum(d.n_toks) OVER (PARTITION BY d.source
        |      ORDER BY md5(CAST(d.doc_id AS VARCHAR) || '#42')
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before
        |  FROM d JOIN p3 USING (source)),
        |sel AS (
        |  SELECT source, repeat_factor AS epoch, doc_id, n_toks
        |  FROM cum WHERE cum_before < remainder
        |  UNION ALL
        |  SELECT d.source,
        |    unnest(range(1, p3.repeat_factor)) AS epoch,
        |    d.doc_id, d.n_toks
        |  FROM d JOIN p3 USING (source))
        |SELECT source, epoch,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        |  CAST(sum(doc_id % 1000003) AS BIGINT) AS fp_sum,
        |  CAST(sum((doc_id % 1000003) * (doc_id % 1000003)) AS BIGINT)
        |    AS fp_sq
        |FROM sel GROUP BY source, epoch
        |ORDER BY source, epoch""".stripMargin,

    "x100_hard_negatives" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id < 16),
         |c AS (
         |  SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS cv
         |  FROM embeddings),
         |sc AS (
         |  SELECT query_id, cand_id,
         |    CAST(floor(${cosineSql("qv", "cv")} * 1000000 + 0.5) AS BIGINT)
         |      AS cos_e6
         |  FROM c, q WHERE cand_id <> query_id),
         |r AS (
         |  SELECT query_id, cand_id, cos_e6,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_e6 DESC, cand_id) AS BIGINT) AS rnk
         |  FROM sc),
         |top AS (SELECT * FROM r WHERE rnk <= 50),
         |pos AS (
         |  SELECT query_id, cand_id AS pos_id, cos_e6 AS pos_e6
         |  FROM top WHERE rnk = 1),
         |neg AS (
         |  SELECT t.query_id, p.pos_id, p.pos_e6,
         |    t.cand_id AS neg_id, t.cos_e6 AS neg_e6,
         |    CAST(row_number() OVER (PARTITION BY t.query_id
         |      ORDER BY t.cos_e6 DESC, t.cand_id) AS BIGINT) AS neg_rnk
         |  FROM top t JOIN pos p USING (query_id)
         |  WHERE t.rnk > 1 AND t.cos_e6 <= p.pos_e6 - 50000)
         |SELECT query_id, pos_id, pos_e6, neg_rnk, neg_id, neg_e6
         |FROM neg WHERE neg_rnk <= 5
         |ORDER BY query_id, neg_rnk""".stripMargin,

    // x101: the same split / planted-swap / add-one-smoothed counts /
    // quantized-ln model; the hash compare therefore pins the LEARNED
    // WEIGHTS (through every holdout doc's integer score), not just
    // the predictions.
    "x101_nb_quality" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)
        |      AS label,
        |    CASE WHEN lang = 'en' AND doc_id % 2 = 0
        |      THEN list_transform(string_split_regex(text, '\s+'),
        |        x -> CASE WHEN x = 'data' THEN 'datum'
        |                  WHEN x = 'table' THEN 'tbl' ELSE x END)
        |      ELSE string_split_regex(text, '\s+') END AS t
        |  FROM documents),
        |tr AS (SELECT * FROM d WHERE doc_id % 3 = 0),
        |ho AS (SELECT * FROM d WHERE doc_id % 3 <> 0),
        |tok AS (SELECT label, unnest(t) AS token FROM tr),
        |cnt AS (
        |  SELECT token,
        |    sum(label) AS c_pos, sum(1 - label) AS c_neg
        |  FROM tok GROUP BY token),
        |tot AS (
        |  SELECT sum(c_pos) AS n_pos, sum(c_neg) AS n_neg,
        |    count(*) AS v
        |  FROM cnt),
        |pri AS (
        |  SELECT
        |    CAST(round(round(ln((sum(label) + 1.0)
        |      / (sum(1 - label) + 1.0)), 6) * 1e6) AS BIGINT)
        |      AS prior_e6
        |  FROM tr),
        |model AS (
        |  SELECT token,
        |    CAST(round(round(ln((c_pos + 1.0) * (n_neg + v)
        |      / ((c_neg + 1.0) * (n_pos + v))), 6) * 1e6) AS BIGINT)
        |      AS llr_e6
        |  FROM cnt, tot),
        |unseen AS (
        |  SELECT CAST(round(round(ln(CAST(n_neg + v AS DOUBLE)
        |      / CAST(n_pos + v AS DOUBLE)), 6) * 1e6) AS BIGINT)
        |      AS unseen_e6
        |  FROM tot),
        |htok AS (SELECT doc_id, label, unnest(t) AS token FROM ho),
        |sc AS (
        |  SELECT h.doc_id, h.label,
        |    CAST(count(*) AS BIGINT) AS n_toks,
        |    CAST(sum(coalesce(m.llr_e6, u.unseen_e6)) AS BIGINT) AS s
        |  FROM htok h LEFT JOIN model m USING (token), unseen u
        |  GROUP BY h.doc_id, h.label)
        |SELECT doc_id, label, n_toks,
        |  CAST(p.prior_e6 + s AS BIGINT) AS score_e6,
        |  (p.prior_e6 + s) > 0 AS pred
        |FROM sc, pri p
        |ORDER BY doc_id""".stripMargin,

    // x102: same distinct-ratio score, a plain global rank (the oracle
    // may sort the corpus; the engine's two-level rank must agree),
    // the same 8-hex md5 uniform and quantized Pareto draw.
    "x102_quality_accept" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST(len(list_distinct(t)) AS BIGINT) * 1000000
        |      // CAST(len(t) AS BIGINT) AS score_ppm
        |  FROM d WHERE len(t) > 0),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM s),
        |r AS (
        |  SELECT doc_id, score_ppm,
        |    CAST(row_number() OVER (ORDER BY score_ppm, doc_id)
        |      AS BIGINT) AS rnk
        |  FROM s),
        |u AS (
        |  SELECT doc_id, score_ppm, rnk,
        |    CAST(list_sum([(strpos('0123456789abcdef',
        |                     substr(md5(CAST(doc_id AS VARCHAR) || '#acc'),
        |                       i, 1)) - 1)
        |                    * CAST(pow(16, 8 - i) AS BIGINT)
        |                    for i in range(1, 9)]) AS BIGINT) % 1000000
        |      AS u_ppm
        |  FROM r),
        |g AS (
        |  SELECT doc_id, score_ppm, rnk,
        |    ((rnk - 1) * 1000000) // greatest(n_total - 1, 1)
        |      AS rank_ppm,
        |    u_ppm,
        |    CAST(round(round(pow(1.0 - CAST(u_ppm AS DOUBLE) / 1000000.0,
        |      -1.0/9.0) - 1.0, 6) * 1e6) AS BIGINT) AS pareto_e6
        |  FROM u, n)
        |SELECT doc_id, score_ppm, rnk, rank_ppm, u_ppm, pareto_e6,
        |  (rank_ppm + pareto_e6) > 1000000 AS keep
        |FROM g
        |ORDER BY doc_id""".stripMargin,

    // x103: the x92 train/encode template (same sample, same 3 rules,
    // same rewrite chain), then the per-language fertility aggregate
    // in the same integer ppm.
    "x103_tokenizer_fertility" -> {
      def rewrite(src: String, out: String, m: String): String =
        s"""$out AS (
           |  SELECT doc_id,
           |    [CASE WHEN toks[i] = m.ma AND i < len(toks)
           |               AND toks[i+1] = m.mb
           |          THEN m.ma || '_' || m.mb ELSE toks[i] END
           |     for i in range(1, len(toks) + 1)
           |     if NOT (i > 1 AND toks[i-1] = m.ma AND toks[i] = m.mb)]
           |      AS toks
           |  FROM $src, $m m)""".stripMargin
      def rule(r: Int): String =
        s"""m_$r AS (
           |  SELECT string_split(ab, chr(1))[1] AS ma,
           |         string_split(ab, chr(1))[2] AS mb
           |  FROM rk WHERE r = $r)""".stripMargin
      s"""WITH t_0 AS (
         |  SELECT doc_id, lang,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    string_split_regex(text, '\\s+') AS toks
         |  FROM documents),
         |pc AS (
         |  SELECT ab, count(*) AS c FROM (
         |    SELECT unnest([toks[i] || chr(1) || toks[i+1]
         |                   for i in range(1, len(toks))
         |                   if toks[i] <> toks[i+1]]) AS ab
         |    FROM t_0 WHERE doc_id % 10 = 0)
         |  GROUP BY ab),
         |rk AS (
         |  SELECT ab, row_number() OVER (ORDER BY c DESC, ab) AS r
         |  FROM pc),
         |${rule(1)},
         |${rule(2)},
         |${rule(3)},
         |${rewrite("t_0", "e_1", "m_1")},
         |${rewrite("e_1", "e_2", "m_2")},
         |${rewrite("e_2", "e_3", "m_3")},
         |base AS (
         |  SELECT doc_id, lang, n_chars,
         |    CAST(len(toks) AS BIGINT) AS ws_tokens
         |  FROM t_0),
         |agg AS (
         |  SELECT b.lang,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(b.n_chars) AS BIGINT) AS chars,
         |    CAST(sum(b.ws_tokens) AS BIGINT) AS ws_tokens,
         |    CAST(sum(len(e.toks)) AS BIGINT) AS bpe_tokens
         |  FROM e_3 e JOIN base b USING (doc_id)
         |  GROUP BY b.lang)
         |SELECT lang, n_docs, chars, ws_tokens, bpe_tokens,
         |  (bpe_tokens * 1000000) // chars AS fertility_ppm,
         |  (bpe_tokens * 1000000) // ws_tokens AS compression_ppm
         |FROM agg
         |ORDER BY lang""".stripMargin
    },

    // x104: the same dirtying (chr(769) = U+0301 combining acute,
    // chr(8203) = U+200B ZWSP, chr(173) = U+00AD soft hyphen), DuckDB's
    // utf8proc nfc_normalize vs the engine's JDK normalizer -- both UAX
    // #15, so the normalized bytes (and their md5) agree exactly.
    // DuckDB regexp_replace needs the explicit 'g' flag (the x26
    // lesson); len() counts code points in both engines.
    "x104_unicode_normalize" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(text, 'a', 'a' || chr(769), 'g'),
        |                   'e', 'e' || chr(8203), 'g') AS dirty
        |  FROM documents),
        |n AS (SELECT doc_id, dirty, nfc_normalize(dirty) AS nfc FROM d),
        |c AS (
        |  SELECT doc_id, dirty, nfc,
        |    regexp_replace(nfc,
        |      '[' || chr(8203) || chr(173) || ']', '', 'g') AS clean
        |  FROM n)
        |SELECT doc_id,
        |  CAST(len(dirty) AS BIGINT) AS n_dirty,
        |  CAST(len(nfc) AS BIGINT) AS n_nfc,
        |  CAST(len(clean) AS BIGINT) AS n_clean,
        |  CAST(len(dirty) - len(nfc) AS BIGINT) AS n_composed,
        |  md5(clean) AS clean_hash
        |FROM c
        |ORDER BY doc_id""".stripMargin,

    // x105: x101's model verbatim, then the quantized sigmoid, 10
    // equal-width bins, and the exact-integer ECE (gap and total are
    // integer sums; the only float is the round(.,6)-quantized sigmoid
    // itself).
    "x105_calibration_ece" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)
        |      AS label,
        |    CASE WHEN lang = 'en' AND doc_id % 2 = 0
        |      THEN list_transform(string_split_regex(text, '\s+'),
        |        x -> CASE WHEN x = 'data' THEN 'datum'
        |                  WHEN x = 'table' THEN 'tbl' ELSE x END)
        |      ELSE string_split_regex(text, '\s+') END AS t
        |  FROM documents),
        |tr AS (SELECT * FROM d WHERE doc_id % 3 = 0),
        |ho AS (SELECT * FROM d WHERE doc_id % 3 <> 0),
        |tok AS (SELECT label, unnest(t) AS token FROM tr),
        |cnt AS (
        |  SELECT token,
        |    sum(label) AS c_pos, sum(1 - label) AS c_neg
        |  FROM tok GROUP BY token),
        |tot AS (
        |  SELECT sum(c_pos) AS n_pos, sum(c_neg) AS n_neg,
        |    count(*) AS v
        |  FROM cnt),
        |pri AS (
        |  SELECT
        |    CAST(round(round(ln((sum(label) + 1.0)
        |      / (sum(1 - label) + 1.0)), 6) * 1e6) AS BIGINT)
        |      AS prior_e6
        |  FROM tr),
        |model AS (
        |  SELECT token,
        |    CAST(round(round(ln((c_pos + 1.0) * (n_neg + v)
        |      / ((c_neg + 1.0) * (n_pos + v))), 6) * 1e6) AS BIGINT)
        |      AS llr_e6
        |  FROM cnt, tot),
        |unseen AS (
        |  SELECT CAST(round(round(ln(CAST(n_neg + v AS DOUBLE)
        |      / CAST(n_pos + v AS DOUBLE)), 6) * 1e6) AS BIGINT)
        |      AS unseen_e6
        |  FROM tot),
        |htok AS (SELECT doc_id, label, unnest(t) AS token FROM ho),
        |sc AS (
        |  SELECT h.doc_id, h.label,
        |    CAST(p.prior_e6 + sum(coalesce(m.llr_e6, u.unseen_e6))
        |      AS BIGINT) AS score_e6
        |  FROM htok h LEFT JOIN model m USING (token), unseen u, pri p
        |  GROUP BY h.doc_id, h.label, p.prior_e6),
        |prob AS (
        |  SELECT doc_id, label,
        |    CAST(round(round(1.0 / (1.0
        |      + exp(-CAST(score_e6 AS DOUBLE) / 1000000.0)), 6) * 1e6)
        |      AS BIGINT) AS p_e6
        |  FROM sc),
        |bins AS (
        |  SELECT least(p_e6 // 100000, 9) AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(label) AS BIGINT) AS n_pos,
        |    CAST(sum(p_e6) AS BIGINT) AS sum_p_e6
        |  FROM prob GROUP BY 1),
        |g AS (
        |  SELECT bin, n, n_pos, sum_p_e6,
        |    abs(n_pos * 1000000 - sum_p_e6) AS gap_e6n
        |  FROM bins),
        |tt AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS n_total,
        |    CAST(sum(gap_e6n) AS BIGINT) AS gap_total FROM g)
        |SELECT bin, n, n_pos,
        |  sum_p_e6 // n AS conf_e6,
        |  (n_pos * 1000000) // n AS acc_e6,
        |  gap_e6n,
        |  gap_total // n_total AS ece_e6
        |FROM g, tt
        |ORDER BY bin""".stripMargin,

    // x106: same md5-uniform judgments, pair aggregation, and the
    // unrolled integer MM rounds ([[bradleyTerrySql]]) -- every round
    // is integer div + integer sums, so the hash pins the learned
    // strengths through all rounds.
    "x106_bradley_terry" -> bradleyTerrySql(3),

    // x107: same keyed window; DuckDB's windowed list() preserves
    // frame order like Spark's collect_list over an ordered ROWS
    // frame; seq > 1 sidesteps the empty-frame NULL-vs-[] mismatch.
    "x107_context_windows" ->
      """WITH w AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS BIGINT) AS seq,
        |    list(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING) AS ctx
        |  FROM events)
        |SELECT user_id, seq, event_id,
        |  array_to_string(ctx, ' ') AS context,
        |  event_type AS target
        |FROM w WHERE seq > 1
        |ORDER BY user_id, seq""".stripMargin,

    // x108: the x94 integer BM25 scorer over per-query rarest-term
    // candidates; metrics are exact integer ppm.
    "x108_retrieval_eval" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS w
        |  FROM documents),
        |p AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dlen AS (SELECT doc_id, sum(tf) AS dl FROM p GROUP BY 1),
        |tot AS (SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM dlen),
        |dft AS (SELECT w, count(*) AS df FROM p GROUP BY 1),
        |qt AS (
        |  SELECT qid, w, df FROM (
        |    SELECT p.doc_id AS qid, p.w, d.df,
        |      row_number() OVER (PARTITION BY p.doc_id
        |        ORDER BY d.df, p.w) AS trnk
        |    FROM p JOIN dft d USING (w)
        |    WHERE p.doc_id < 20)
        |  WHERE trnk <= 3),
        |sc AS (
        |  SELECT q.qid, p.doc_id,
        |    CAST(sum(CAST(floor(
        |      round(ln((t.n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0), 6)
        |      * (CAST(p.tf * 44 * t.total_dl AS DOUBLE)
        |         / CAST(p.tf * 20 * t.total_dl + 6 * t.total_dl
        |                + 18 * d.dl * t.n_docs AS DOUBLE))
        |      * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS score_e6
        |  FROM p JOIN qt q USING (w) JOIN dlen d USING (doc_id), tot t
        |  GROUP BY q.qid, p.doc_id),
        |r AS (
        |  SELECT qid, doc_id, score_e6,
        |    CAST(row_number() OVER (PARTITION BY qid
        |      ORDER BY score_e6 DESC, doc_id) AS BIGINT) AS rnk
        |  FROM sc),
        |perq AS (
        |  SELECT qid, CAST(count(*) AS BIGINT) AS n_cands,
        |    CAST(min(CASE WHEN doc_id = qid THEN rnk END) AS BIGINT)
        |      AS gold_rank
        |  FROM r GROUP BY qid),
        |m AS (
        |  SELECT qid, n_cands, gold_rank,
        |    CAST(CASE WHEN gold_rank <= 10 THEN 1000000 // gold_rank
        |              ELSE 0 END AS BIGINT) AS rr_ppm,
        |    CAST(gold_rank = 1 AS BIGINT) AS hit1,
        |    CAST(gold_rank <= 5 AS BIGINT) AS hit5,
        |    CAST(gold_rank <= 10 AS BIGINT) AS hit10
        |  FROM perq),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |    CAST(sum(rr_ppm) AS BIGINT) AS rr_sum FROM m)
        |SELECT qid, n_cands, gold_rank, rr_ppm, hit1, hit5, hit10,
        |  rr_sum // n_queries AS mrr_ppm
        |FROM m, a
        |ORDER BY qid""".stripMargin,

    // x109: same clip/aggregate, the same md5 uniforms and the same
    // quantized inverse-CDF Laplace draws; non-negative clamps make
    // the released mean's integer division engine-identical.
    "x109_dp_stats" ->
      """WITH g AS (
        |  SELECT source,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(least(n_chars, 256)) AS BIGINT) AS clip_sum
        |  FROM documents GROUP BY source),
        |u AS (
        |  SELECT source, n_docs, clip_sum,
        |    CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(source || '#dpc'), i, 1)) - 1)
        |      * CAST(pow(16, 8 - i) AS BIGINT)
        |      for i in range(1, 9)]) AS BIGINT) % 1000000 AS u1_ppm,
        |    CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(source || '#dps'), i, 1)) - 1)
        |      * CAST(pow(16, 8 - i) AS BIGINT)
        |      for i in range(1, 9)]) AS BIGINT) % 1000000 AS u2_ppm
        |  FROM g),
        |n AS (
        |  SELECT source, n_docs, clip_sum, u1_ppm, u2_ppm,
        |    n_docs + CAST(round(
        |      (CASE WHEN u1_ppm > 500000 THEN -1.0
        |            WHEN u1_ppm < 500000 THEN 1.0 ELSE 0.0 END) * 2.0
        |      * round(ln(CAST(greatest(
        |          1000000 - abs(u1_ppm - 500000) * 2, 1) AS DOUBLE)
        |          / 1e6), 6)) AS BIGINT) AS dp_n_docs,
        |    clip_sum + CAST(round(
        |      (CASE WHEN u2_ppm > 500000 THEN -1.0
        |            WHEN u2_ppm < 500000 THEN 1.0 ELSE 0.0 END) * 512.0
        |      * round(ln(CAST(greatest(
        |          1000000 - abs(u2_ppm - 500000) * 2, 1) AS DOUBLE)
        |          / 1e6), 6)) AS BIGINT) AS dp_sum
        |  FROM u)
        |SELECT source, n_docs, clip_sum, u1_ppm, u2_ppm, dp_n_docs,
        |  dp_sum,
        |  (greatest(dp_sum, 0) * 1000000) // greatest(dp_n_docs, 1)
        |    AS dp_mean_ppm
        |FROM n
        |ORDER BY source""".stripMargin,

    // x110: the same 15-hex md5 weights over the 9-shard spine; both
    // argmaxes as keyed row_number windows.
    "x110_rendezvous_sharding" ->
      """WITH b AS (
        |  SELECT d.doc_id, r.shard,
        |    CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(CAST(d.doc_id AS VARCHAR) || '#rv'
        |             || CAST(r.shard AS VARCHAR)), i, 1)) - 1)
        |      * CAST(pow(16, 15 - i) AS BIGINT)
        |      for i in range(1, 16)]) AS BIGINT) AS w
        |  FROM documents d
        |  CROSS JOIN (SELECT range AS shard FROM range(9)) r),
        |s9 AS (
        |  SELECT doc_id, shard AS shard9 FROM (
        |    SELECT doc_id, shard,
        |      row_number() OVER (PARTITION BY doc_id
        |        ORDER BY w DESC, shard) AS rn
        |    FROM b) WHERE rn = 1),
        |s8 AS (
        |  SELECT doc_id, shard AS shard8 FROM (
        |    SELECT doc_id, shard,
        |      row_number() OVER (PARTITION BY doc_id
        |        ORDER BY w DESC, shard) AS rn
        |    FROM b WHERE shard < 8) WHERE rn = 1)
        |SELECT s8.doc_id, s8.shard8, s9.shard9,
        |  (s8.shard8 <> s9.shard9) AS moved
        |FROM s8 JOIN s9 USING (doc_id)
        |ORDER BY s8.doc_id""".stripMargin,

    // x111: same 40-bit gram hashes, same encoded rightmost-min key,
    // same full-window filter and min≠max sharing rule.
    "x111_winnowing" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, 'inserted preamble marker ' || text
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM corpus),
        |ix AS (
        |  SELECT doc_id, t,
        |    unnest(range(0, CAST(len(t) - 4 AS BIGINT) + 1)) AS idx
        |  FROM tok WHERE len(t) >= 8),
        |gh AS (
        |  SELECT doc_id, idx,
        |    CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(array_to_string(t[idx+1 : idx+4], ' ')), i, 1)) - 1)
        |      * CAST(pow(16, 10 - i) AS BIGINT)
        |      for i in range(1, 11)]) AS BIGINT) AS h
        |  FROM ix),
        |enc AS (
        |  SELECT doc_id, idx,
        |    count(*) OVER (PARTITION BY doc_id) AS n_grams,
        |    min(h * 2097152 + (2097151 - idx)) OVER (
        |      PARTITION BY doc_id ORDER BY idx
        |      ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS sel
        |  FROM gh),
        |fpp AS (
        |  SELECT DISTINCT doc_id, sel // 2097152 AS fp_h,
        |    2097151 - (sel % 2097152) AS fp_pos
        |  FROM enc WHERE idx <= n_grams - 5),
        |mk AS (
        |  SELECT doc_id, fp_h,
        |    min(doc_id) OVER (PARTITION BY fp_h) AS mn,
        |    max(doc_id) OVER (PARTITION BY fp_h) AS mx
        |  FROM fpp)
        |SELECT doc_id, count(*) AS n_fp,
        |  CAST(sum(CASE WHEN mn <> mx THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_shared,
        |  (CAST(sum(CASE WHEN mn <> mx THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000) // count(*) AS share_ppm,
        |  (CAST(sum(CASE WHEN mn <> mx THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000) // count(*) >= 500000 AS near_dup
        |FROM mk GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // x112: same hashed unigram+bigram buckets, separate quantized
    // lns (no product overflow), nested re-integerized Gumbel.
    "x112_dsir" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, string_split_regex(text, '\s+') AS t
        |  FROM documents),
        |feats AS (
        |  SELECT doc_id, lang,
        |    CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(f), i, 1)) - 1) * CAST(pow(16, 8 - i) AS BIGINT)
        |      for i in range(1, 9)]) AS BIGINT) % 64 AS b
        |  FROM (
        |    SELECT doc_id, lang, unnest(list_concat(t,
        |      list_transform(generate_series(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1]))) AS f
        |    FROM tok WHERE len(t) >= 2)),
        |model AS (
        |  SELECT b, count(*) AS raw_n,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS tgt_n
        |  FROM feats GROUP BY b),
        |tot AS (
        |  SELECT CAST(sum(raw_n) AS BIGINT) AS raw_tot,
        |    CAST(sum(tgt_n) AS BIGINT) AS tgt_tot FROM model),
        |lam AS (
        |  SELECT b,
        |    CAST(round(round(ln(CAST(tgt_n + 1 AS DOUBLE)
        |        / CAST(tgt_tot + 64 AS DOUBLE)), 6) * 1e6) AS BIGINT)
        |    - CAST(round(round(ln(CAST(raw_n + 1 AS DOUBLE)
        |        / CAST(raw_tot + 64 AS DOUBLE)), 6) * 1e6) AS BIGINT)
        |      AS lam_e6
        |  FROM model, tot),
        |wts AS (
        |  SELECT doc_id, count(*) AS n_feats,
        |    CAST(sum(lam_e6) AS BIGINT) AS w_e6
        |  FROM feats JOIN lam USING (b) GROUP BY doc_id),
        |gum AS (
        |  SELECT doc_id, n_feats, w_e6, u_ppm,
        |    -CAST(round(round(ln(CAST(greatest(u_ppm, 1) AS DOUBLE)
        |      / 1e6), 6) * 1e6) AS BIGINT) AS nl_e6
        |  FROM (
        |    SELECT doc_id, n_feats, w_e6,
        |      CAST(list_sum([(strpos('0123456789abcdef',
        |        substr(md5(CAST(doc_id AS VARCHAR) || '#dsir'), i, 1)) - 1)
        |        * CAST(pow(16, 8 - i) AS BIGINT)
        |        for i in range(1, 9)]) AS BIGINT) % 1000000 AS u_ppm
        |    FROM wts)),
        |sc AS (
        |  SELECT doc_id, n_feats, w_e6, u_ppm,
        |    -CAST(round(round(ln(CAST(nl_e6 AS DOUBLE) / 1e6), 6) * 1e6)
        |      AS BIGINT) AS g_e6,
        |    w_e6 - CAST(round(round(ln(CAST(nl_e6 AS DOUBLE) / 1e6), 6)
        |      * 1e6) AS BIGINT) AS score_e6
        |  FROM gum)
        |SELECT doc_id, n_feats, w_e6, u_ppm, g_e6, score_e6,
        |  row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS rnk
        |FROM sc
        |ORDER BY score_e6 DESC, doc_id
        |LIMIT 100""".stripMargin,

    // x113: content-hash-keyed captures, Chapman estimator.
    "x113_caprecap" ->
      """WITH corpus AS (
        |  SELECT d.doc_id + r.copy * 10000 AS doc_id, d.text
        |  FROM documents d
        |  CROSS JOIN (SELECT range AS copy FROM range(4)) r
        |  WHERE r.copy <= d.doc_id % 4),
        |per_text AS (
        |  SELECT md5(text) AS ch, count(*) AS n_rows
        |  FROM corpus GROUP BY md5(text)),
        |caps AS (
        |  SELECT n_rows,
        |    CASE WHEN CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(ch || '#c1'), i, 1)) - 1)
        |      * CAST(pow(16, 8 - i) AS BIGINT)
        |      for i in range(1, 9)]) AS BIGINT) % 1000000 < 400000
        |      THEN 1 ELSE 0 END AS c1,
        |    CASE WHEN CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(ch || '#c2'), i, 1)) - 1)
        |      * CAST(pow(16, 8 - i) AS BIGINT)
        |      for i in range(1, 9)]) AS BIGINT) % 1000000 < 400000
        |      THEN 1 ELSE 0 END AS c2
        |  FROM per_text),
        |agg AS (
        |  SELECT CAST(sum(n_rows) AS BIGINT) AS n_rows,
        |    count(*) AS true_distinct,
        |    CAST(sum(c1) AS BIGINT) AS n1,
        |    CAST(sum(c2) AS BIGINT) AS n2,
        |    CAST(sum(c1 * c2) AS BIGINT) AS m
        |  FROM caps)
        |SELECT n_rows, n1, n2, m,
        |  ((n1 + 1) * (n2 + 1)) // (m + 1) - 1 AS est_distinct,
        |  true_distinct,
        |  (greatest(n_rows - (((n1 + 1) * (n2 + 1)) // (m + 1) - 1), 0)
        |    * 1000000) // n_rows AS dup_rate_ppm,
        |  ((n_rows - true_distinct) * 1000000) // n_rows
        |    AS true_dup_rate_ppm
        |FROM agg""".stripMargin,

    // x115: same 50-pair truncation probe, same quantized S-curve.
    "x115_lsh_planner" ->
      """WITH d2 AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t
        |  FROM documents
        |  WHERE doc_id < 50 AND len(string_split_regex(text, '\s+')) >= 6),
        |base AS (
        |  SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |    for i in range(1, len(t) - 1)]) AS sa
        |  FROM d2),
        |tr AS (
        |  SELECT doc_id, list_distinct([tt[i] || ' ' || tt[i+1] || ' ' || tt[i+2]
        |    for i in range(1, len(tt) - 1)]) AS sb
        |  FROM (SELECT doc_id, t[1:greatest(len(t) - 3, 0)] AS tt FROM d2)
        |  WHERE len(tt) >= 3),
        |probe AS (
        |  SELECT CAST(sum(jac_ppm) AS BIGINT) AS jsum, count(*) AS n_pairs
        |  FROM (
        |    SELECT (CAST(len(list_intersect(sa, sb)) AS BIGINT) * 1000000)
        |      // (len(sa) + len(sb) - len(list_intersect(sa, sb)))
        |      AS jac_ppm
        |    FROM base JOIN tr USING (doc_id))),
        |pr AS (
        |  SELECT n_pairs, jsum // n_pairs AS s_high_ppm,
        |    (jsum // n_pairs) // 2 AS s_low_ppm
        |  FROM probe),
        |grid AS (
        |  SELECT CAST(1 << range AS BIGINT) AS r,
        |    CAST(128 // (1 << range) AS BIGINT) AS b
        |  FROM range(8)),
        |sc AS (
        |  SELECT r, b, s_low_ppm, s_high_ppm,
        |    CAST(round(round(pow(1.0 / b, 1.0 / r), 6) * 1e6) AS BIGINT)
        |      AS t_e6,
        |    1000000 - CAST(round(round(pow(1.0 - round(pow(
        |      CAST(s_low_ppm AS DOUBLE) / 1e6, r), 6), b), 6) * 1e6)
        |      AS BIGINT) AS p_low_e6,
        |    1000000 - CAST(round(round(pow(1.0 - round(pow(
        |      CAST(s_high_ppm AS DOUBLE) / 1e6, r), 6), b), 6) * 1e6)
        |      AS BIGINT) AS p_high_e6
        |  FROM grid, pr)
        |SELECT r, b, s_low_ppm, s_high_ppm, t_e6, p_low_e6, p_high_e6,
        |  p_low_e6 + (1000000 - p_high_e6) AS cost_e6,
        |  row_number() OVER (
        |    ORDER BY p_low_e6 + (1000000 - p_high_e6), r) = 1 AS is_best
        |FROM sc
        |ORDER BY r""".stripMargin,

    // x116: same type-table rank/cumsum, same crossing-row predicate.
    "x116_vocab_coverage" ->
      """WITH freq AS (
        |  SELECT tok, count(*) AS cnt FROM (
        |    SELECT unnest(string_split_regex(text, '\s+')) AS tok
        |    FROM documents)
        |  GROUP BY tok),
        |ranked AS (
        |  SELECT tok, cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT)
        |      AS rnk,
        |    CAST(sum(cnt) OVER (ORDER BY cnt DESC, tok
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM freq),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM freq),
        |pcts AS (SELECT CAST(unnest([50, 90, 95, 99]) AS BIGINT) AS pct)
        |SELECT pct, rnk AS vocab_size, cum AS tokens_covered,
        |  (cum * 1000000) // total AS coverage_ppm
        |FROM ranked, tot, pcts
        |WHERE cum * 100 >= pct * total
        |  AND (cum - cnt) * 100 < pct * total
        |ORDER BY pct""".stripMargin,

    // x117: same √p weights, same fixed 4-round water-filling unroll
    // ([[cappedMixSql]]).
    "x117_capped_mixing" -> cappedMixSql(4),

    // x118: same echo corpus, same first-occurrence mark, same
    // islands → intervals → positional token filter as the x65 form.
    "x118_self_repetition" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000,
        |    text || ' ' || array_to_string(
        |      (string_split_regex(text, '\s+'))[1:12], ' ')
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM corpus),
        |ix AS (
        |  SELECT doc_id, t,
        |    unnest(range(0, greatest(CAST(len(t) - 8 AS BIGINT) + 1, 0)))
        |      AS idx
        |  FROM tok WHERE len(t) >= 8),
        |wins AS (
        |  SELECT doc_id, idx,
        |    md5(array_to_string(t[idx+1 : idx+8], ' ')) AS h
        |  FROM ix),
        |firsts AS (
        |  SELECT doc_id, h, min(idx) AS fidx FROM wins GROUP BY doc_id, h),
        |iv AS (
        |  SELECT doc_id, island,
        |    min(idx) AS s, max(idx) + 7 AS e
        |  FROM (
        |    SELECT w.doc_id, w.idx,
        |      w.idx - row_number() OVER (PARTITION BY w.doc_id
        |        ORDER BY w.idx) AS island
        |    FROM wins w JOIN firsts f
        |      ON f.doc_id = w.doc_id AND f.h = w.h
        |    WHERE w.idx > f.fidx)
        |  GROUP BY doc_id, island),
        |pos AS (
        |  SELECT doc_id, unnest(range(0, CAST(len(t) AS BIGINT))) AS i
        |  FROM tok),
        |rem AS (
        |  SELECT DISTINCT p.doc_id, p.i
        |  FROM pos p JOIN iv ON iv.doc_id = p.doc_id
        |    AND p.i BETWEEN iv.s AND iv.e),
        |kept AS (
        |  SELECT p.doc_id, p.i
        |  FROM pos p LEFT JOIN rem r ON r.doc_id = p.doc_id AND r.i = p.i
        |  WHERE r.i IS NULL),
        |rebuilt AS (
        |  SELECT k.doc_id,
        |    count(*) AS n_kept,
        |    string_agg(tok.t[k.i + 1], ' ' ORDER BY k.i) AS clean
        |  FROM kept k JOIN tok ON tok.doc_id = k.doc_id
        |  GROUP BY k.doc_id)
        |SELECT c.doc_id,
        |  CAST(len(t.t) AS BIGINT) AS n_tokens,
        |  CAST(len(t.t) - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
        |  md5(coalesce(clean, '')) AS clean_md5
        |FROM corpus c
        |JOIN tok t ON t.doc_id = c.doc_id
        |LEFT JOIN rebuilt r ON r.doc_id = c.doc_id
        |ORDER BY c.doc_id""".stripMargin,

    // x119: plain global rank (equals the engine's two-level form by
    // construction), same decile/round-robin arithmetic.
    "x119_curriculum_interleave" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST(len(list_distinct(t)) AS BIGINT) * 1000000
        |      // CAST(len(t) AS BIGINT) AS score_ppm
        |  FROM d WHERE len(t) > 0),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM s),
        |r AS (
        |  SELECT doc_id, score_ppm,
        |    CAST(row_number() OVER (ORDER BY score_ppm, doc_id)
        |      AS BIGINT) AS rnk
        |  FROM s),
        |g AS (
        |  SELECT doc_id, score_ppm, rnk,
        |    ((rnk - 1) * 10) // n_total AS decile
        |  FROM r, n),
        |w AS (
        |  SELECT g.doc_id, g.score_ppm, g.rnk, g.decile,
        |    g.rnk - (g.decile * n.n_total) // 10 AS wrank
        |  FROM g, n)
        |SELECT doc_id, score_ppm, rnk, decile, wrank,
        |  (wrank - 1) * 10 + decile AS pos
        |FROM w
        |ORDER BY pos""".stripMargin,

    // x120: same three signals, plain global ranks, same integer
    // blend.
    "x120_quality_rank_blend" ->
      s"""WITH d AS (
         |  SELECT doc_id, n_chars, string_split_regex(text, '\\s+') AS t
         |  FROM documents),
         |s AS (
         |  SELECT doc_id,
         |    CAST(len(list_distinct(t)) AS BIGINT) * 1000000
         |      // CAST(len(t) AS BIGINT) AS ttr_ppm,
         |    CAST(len(list_filter(t, x -> x IN ($stoplistSql)))
         |      AS BIGINT) * 1000000 // CAST(len(t) AS BIGINT)
         |      AS stop_ppm,
         |    least(n_chars * 1000000 // (CAST(len(t) AS BIGINT) * 16),
         |      1000000) AS wlen_ppm
         |  FROM d WHERE len(t) > 0),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM s),
         |r AS (
         |  SELECT doc_id, ttr_ppm, stop_ppm, wlen_ppm,
         |    CAST(row_number() OVER (ORDER BY ttr_ppm, doc_id)
         |      AS BIGINT) AS r1,
         |    CAST(row_number() OVER (ORDER BY stop_ppm, doc_id)
         |      AS BIGINT) AS r2,
         |    CAST(row_number() OVER (ORDER BY wlen_ppm, doc_id)
         |      AS BIGINT) AS r3
         |  FROM s)
         |SELECT doc_id, ttr_ppm, stop_ppm, wlen_ppm, r1, r2, r3,
         |  (((r1 - 1) * 1000000 // greatest(n_total - 1, 1)) +
         |   ((r2 - 1) * 1000000 // greatest(n_total - 1, 1)) +
         |   ((r3 - 1) * 1000000 // greatest(n_total - 1, 1))) // 3
         |    AS blend_ppm,
         |  (((r1 - 1) * 1000000 // greatest(n_total - 1, 1)) +
         |   ((r2 - 1) * 1000000 // greatest(n_total - 1, 1)) +
         |   ((r3 - 1) * 1000000 // greatest(n_total - 1, 1))) // 3
         |    >= 500000 AS keep
         |FROM r, n
         |ORDER BY doc_id""".stripMargin,

    // x121: same window/stride arithmetic, non-negative div only.
    "x121_rag_chunks" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n
        |  FROM tok WHERE len(t) > 0),
        |ch AS (
        |  SELECT doc_id, n, unnest(range(0,
        |    CASE WHEN n <= 32 THEN 1 ELSE (n - 32 + 23) // 24 + 1 END))
        |    AS i, t
        |  FROM d)
        |SELECT doc_id, n AS n_tokens, i AS chunk_idx,
        |  i * 24 AS start_tok,
        |  least(32, n - i * 24) AS chunk_len,
        |  md5(array_to_string(t[i*24+1 : i*24+32], ' ')) AS chunk_md5
        |FROM ch
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    // x122: the x02 candidate machinery + md5 split membership; the
    // component labels via the x23 recursive-reach form.
    "x122_split_leakage" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000,
        |    array_to_string(
        |      (string_split_regex(text, '\s+'))[1:len(string_split_regex(text, '\s+')) - 3],
        |      ' ')
        |  FROM documents),
        |tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM corpus),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                   for i in range(1, len(t) - 1)]) AS s
        |  FROM tok WHERE len(t) >= 3),
        |sig AS (
        |  SELECT doc_id, s,
        |    [list_min([substr(md5(x || '#' || CAST(h // 4 AS VARCHAR)),
        |                      CAST(1 + 8 * (h % 4) AS INT), 8) for x in s])
        |     for h in range(0, 12)] AS g
        |  FROM sh),
        |bands AS (
        |  SELECT doc_id, b, md5(g[3*b+1] || g[3*b+2] || g[3*b+3]) AS bh
        |  FROM sig, range(0, 4) r(b)),
        |cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT doc_a, doc_b,
        |    CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        |      / CAST(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))
        |             AS DOUBLE) AS jac
        |  FROM cand
        |  JOIN sh sa ON sa.doc_id = doc_a
        |  JOIN sh sb ON sb.doc_id = doc_b),
        |p AS (
        |  SELECT doc_a, doc_b FROM j WHERE jac >= 0.5),
        |sym AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p),
        |reach(id, m) AS (
        |  SELECT doc_id, doc_id FROM sh
        |  UNION
        |  SELECT s.dst, r.m FROM reach r JOIN sym s ON s.src = r.id),
        |comp AS (SELECT id AS doc_id, min(m) AS cluster_id
        |         FROM reach GROUP BY id),
        |f AS (
        |  SELECT
        |    (CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(CAST(doc_a AS VARCHAR) || '#spl'), i, 1)) - 1)
        |      * CAST(pow(16, 8 - i) AS BIGINT) for i in range(1, 9)])
        |      AS BIGINT) % 1000000 < 200000) AS ta_n,
        |    (CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(CAST(doc_b AS VARCHAR) || '#spl'), i, 1)) - 1)
        |      * CAST(pow(16, 8 - i) AS BIGINT) for i in range(1, 9)])
        |      AS BIGINT) % 1000000 < 200000) AS tb_n,
        |    (CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(CAST(doc_a % 10000 AS VARCHAR) || '#spl'), i, 1)) - 1)
        |      * CAST(pow(16, 8 - i) AS BIGINT) for i in range(1, 9)])
        |      AS BIGINT) % 1000000 < 200000) AS ta_g,
        |    (CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(CAST(doc_b % 10000 AS VARCHAR) || '#spl'), i, 1)) - 1)
        |      * CAST(pow(16, 8 - i) AS BIGINT) for i in range(1, 9)])
        |      AS BIGINT) % 1000000 < 200000) AS tb_g,
        |    (CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(CAST(ca.cluster_id AS VARCHAR) || '#spl'), i, 1)) - 1)
        |      * CAST(pow(16, 8 - i) AS BIGINT) for i in range(1, 9)])
        |      AS BIGINT) % 1000000 < 200000) AS ta_c,
        |    (CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(CAST(cb.cluster_id AS VARCHAR) || '#spl'), i, 1)) - 1)
        |      * CAST(pow(16, 8 - i) AS BIGINT) for i in range(1, 9)])
        |      AS BIGINT) % 1000000 < 200000) AS tb_c
        |  FROM p
        |  JOIN comp ca ON ca.doc_id = p.doc_a
        |  JOIN comp cb ON cb.doc_id = p.doc_b),
        |agg AS (
        |  SELECT count(*) AS n_pairs,
        |    CAST(sum(CASE WHEN ta_n <> tb_n THEN 1 ELSE 0 END) AS BIGINT)
        |      AS naive_leaks,
        |    CAST(sum(CASE WHEN ta_g <> tb_g THEN 1 ELSE 0 END) AS BIGINT)
        |      AS group_leaks,
        |    CAST(sum(CASE WHEN ta_c <> tb_c THEN 1 ELSE 0 END) AS BIGINT)
        |      AS comp_leaks
        |  FROM f)
        |SELECT 'component' AS strategy, n_pairs, comp_leaks AS n_cross,
        |  (comp_leaks * 1000000) // greatest(n_pairs, 1) AS leak_ppm
        |FROM agg
        |UNION ALL
        |SELECT 'group', n_pairs, group_leaks,
        |  (group_leaks * 1000000) // greatest(n_pairs, 1)
        |FROM agg
        |UNION ALL
        |SELECT 'naive', n_pairs, naive_leaks,
        |  (naive_leaks * 1000000) // greatest(n_pairs, 1)
        |FROM agg
        |ORDER BY strategy""".stripMargin,

    // x123: x13's sessionize, lead-within-session, same smoothing.
    "x123_action_transitions" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    lag(epoch_ms(ts)) OVER w AS prev_ms
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |b AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms > 1800000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM g),
        |sess AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS session_id
        |  FROM b),
        |tr AS (
        |  SELECT event_type AS from_type,
        |    coalesce(lead(event_type) OVER (
        |      PARTITION BY user_id, session_id ORDER BY ts, event_id),
        |      'END') AS to_type
        |  FROM sess),
        |cnt AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM tr GROUP BY from_type, to_type),
        |v AS (SELECT CAST(count(DISTINCT from_type) AS BIGINT) AS v
        |      FROM cnt),
        |rt AS (
        |  SELECT from_type, CAST(sum(n) AS BIGINT) AS row_total
        |  FROM cnt GROUP BY from_type)
        |SELECT c.from_type, c.to_type, c.n, rt.row_total,
        |  ((c.n + 1) * 1000000) // (rt.row_total + v.v + 1) AS p_ppm
        |FROM cnt c JOIN rt USING (from_type), v
        |ORDER BY c.from_type, c.to_type""".stripMargin,

    // x124: the x96 recount-loop generators unrolled to depth 16 —
    // the oracle re-derives EVERY pair count from the rewritten
    // training corpus each round (16 pair scans + 15 train rewrites),
    // then encodes the full corpus through the same 16 rules.
    "x124_bpe_depth_train" -> {
      val depth = 16
      // LEFT JOIN + null-safe predicates: if a round finds no pair
      // left to merge (degenerate/small corpus), its m_r is EMPTY and
      // a cross join would silently empty the corpus while the engine
      // (trainFast with < depth rules) passes it through — so a missing
      // rule row must be a no-op rewrite (round-13 advisor finding)
      def rewrite(src: String, out: String, m: String): String =
        s"""$out AS MATERIALIZED (
           |  SELECT doc_id,
           |    [CASE WHEN m.ma IS NOT NULL AND toks[i] = m.ma
           |               AND i < len(toks) AND toks[i+1] = m.mb
           |          THEN m.ma || '_' || m.mb ELSE toks[i] END
           |     for i in range(1, len(toks) + 1)
           |     if NOT (i > 1 AND m.ma IS NOT NULL
           |             AND toks[i-1] = m.ma AND toks[i] = m.mb)]
           |      AS toks
           |  FROM $src LEFT JOIN $m m ON TRUE)""".stripMargin
      def pair(src: String, cur: Int): String =
        s"""p_$cur AS MATERIALIZED (
           |  SELECT unnest([toks[i] || chr(1) || toks[i+1]
           |                 for i in range(1, len(toks))
           |                 if toks[i] <> toks[i+1]]) AS ab
           |  FROM $src),
           |m_$cur AS MATERIALIZED (
           |  SELECT string_split(ab, chr(1))[1] AS ma,
           |         string_split(ab, chr(1))[2] AS mb
           |  FROM (SELECT ab, count(*) AS c FROM p_$cur GROUP BY ab)
           |  ORDER BY c DESC, ab LIMIT 1)""".stripMargin
      val trainCtes = (1 to depth).map { r =>
        if (r < depth)
          pair(s"tr_${r - 1}", r) + ",\n" +
            rewrite(s"tr_${r - 1}", s"tr_$r", s"m_$r")
        else pair(s"tr_${r - 1}", r)
      }.mkString(",\n")
      val encodeCtes = (1 to depth).map { r =>
        rewrite(if (r == 1) "t_0" else s"e_${r - 1}", s"e_$r", s"m_$r")
      }.mkString(",\n")
      s"""WITH t_0 AS MATERIALIZED (
         |  SELECT doc_id, string_split_regex(text, '\\s+') AS toks
         |  FROM documents),
         |tr_0 AS MATERIALIZED (SELECT doc_id, toks FROM t_0 WHERE doc_id % 10 = 0),
         |$trainCtes,
         |$encodeCtes
         |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  md5(list_aggregate(toks, 'string_agg', ' ')) AS tokens_md5
         |FROM e_$depth
         |ORDER BY doc_id""".stripMargin
    },

    // x125: the same md5 coin/cuts (hex→int via the strpos ladder) and
    // the same PSM rendering through 1-based inclusive list slices;
    // empty slices string_agg to NULL, hence the coalesces.
    "x125_fim_transform" -> {
      def hex8(e: String): String =
        s"CAST(list_sum([(strpos('0123456789abcdef', substr(md5($e), i, 1)) - 1) " +
          s"* CAST(pow(16, 8 - i) AS BIGINT) for i in range(1, 9)]) AS BIGINT)"
      def j(sl: String): String =
        s"coalesce(list_aggregate($sl, 'string_agg', ' '), '')"
      s"""WITH tok AS (
         |  SELECT doc_id, string_split_regex(text, '\\s+') AS t
         |  FROM documents
         |  WHERE len(string_split_regex(text, '\\s+')) > 0),
         |d AS (
         |  SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n,
         |    (n >= 4 AND ${hex8("CAST(doc_id AS VARCHAR) || '#fim?'")} % 2 = 0)
         |      AS fim,
         |    ${hex8("CAST(doc_id AS VARCHAR) || '#fimc1'")} % (n + 1) AS c1,
         |    ${hex8("CAST(doc_id AS VARCHAR) || '#fimc2'")} % (n + 1) AS c2
         |  FROM tok),
         |cut AS (
         |  SELECT doc_id, t, n, fim,
         |    least(c1, c2) AS cut_a, greatest(c1, c2) AS cut_b
         |  FROM d)
         |SELECT doc_id,
         |  CASE WHEN fim THEN 'fim' ELSE 'ar' END AS mode,
         |  cut_a, cut_b,
         |  n + CASE WHEN fim THEN 3 ELSE 0 END AS n_tokens,
         |  md5(CASE WHEN fim THEN
         |    '<PRE> ' || ${j("t[1:CAST(cut_a AS INT)]")} ||
         |    ' <SUF> ' || ${j("t[CAST(cut_b + 1 AS INT):CAST(n AS INT)]")} ||
         |    ' <MID> ' || ${j("t[CAST(cut_a + 1 AS INT):CAST(cut_b AS INT)]")}
         |    ELSE ${j("t")} END) AS rendered_md5
         |FROM cut
         |ORDER BY doc_id""".stripMargin
    },

    // x126: same ladder bucket expression, same planted twins
    // (the x58 quantization), same integer margin arithmetic — the
    // `//` floor-div equals Spark's `div` because every operand here
    // is non-negative.
    // code width scales with the join corpus (5n/4 rows) exactly as
    // the engine's planesFor does — same integer ladder, hyperplane
    // formula inline (see the x10 oracle note).
    "x126_bitext_margin" -> {
      val varBucket =
        """CAST(list_sum(
          |      [CASE WHEN list_sum(
          |         [v[i] * ((((i-1)*37 + j*101) % 13) - 6)
          |          for i in range(1, len(v)+1)]) > 0
          |       THEN (CAST(1 AS BIGINT) << j) ELSE 0 END
          |       for j in range(0, planes)]) AS BIGINT)""".stripMargin
      s"""WITH base AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |nn AS (SELECT count(*) + count(*) // 4 AS n FROM embeddings),
         |par AS (
         |  SELECT CAST(8 + list_sum(
         |    [CASE WHEN n > 256 * (CAST(1 AS BIGINT) << t) THEN 1 ELSE 0 END
         |     for t in range(8, 24)]) AS INT) AS planes
         |  FROM nn),
         |src AS (
         |  SELECT vec_id, v, $varBucket AS bucket
         |  FROM base, par WHERE vec_id % 2 = 0),
         |tgt0 AS (
         |  SELECT vec_id, v FROM base WHERE vec_id % 2 = 1
         |  UNION ALL
         |  SELECT vec_id + 1000000, [round(x * 1024) / 1024 for x in v]
         |  FROM base WHERE vec_id % 4 = 0),
         |tgt AS (SELECT vec_id, v, $varBucket AS bucket FROM tgt0, par),
         |cand AS (
         |  SELECT a.vec_id AS src_id, b.vec_id AS tgt_id,
         |    CAST(floor((${cosineSql("a.v", "b.v")}) * 1000000 + 0.5)
         |      AS BIGINT) AS cos_e6
         |  FROM src a JOIN tgt b ON a.bucket = b.bucket),
         |asrc AS (
         |  SELECT src_id, CAST(sum(cos_e6 + 1000000) // count(*) AS BIGINT) AS avg_s
         |  FROM (SELECT src_id, cos_e6,
         |          row_number() OVER (PARTITION BY src_id
         |            ORDER BY cos_e6 DESC, tgt_id) AS r FROM cand)
         |  WHERE r <= 4 GROUP BY src_id),
         |atgt AS (
         |  SELECT tgt_id, CAST(sum(cos_e6 + 1000000) // count(*) AS BIGINT) AS avg_t
         |  FROM (SELECT tgt_id, cos_e6,
         |          row_number() OVER (PARTITION BY tgt_id
         |            ORDER BY cos_e6 DESC, src_id) AS r FROM cand)
         |  WHERE r <= 4 GROUP BY tgt_id),
         |scored AS (
         |  SELECT c.src_id, c.tgt_id, c.cos_e6,
         |    CAST((c.cos_e6 + 1000000) * 2000000 // greatest(s.avg_s + t.avg_t, 1)
         |      AS BIGINT) AS margin_ppm
         |  FROM cand c JOIN asrc s USING (src_id)
         |  JOIN atgt t USING (tgt_id)),
         |best AS (
         |  SELECT *, row_number() OVER (PARTITION BY src_id
         |    ORDER BY margin_ppm DESC, tgt_id) AS rnk FROM scored)
         |SELECT src_id, tgt_id, cos_e6, margin_ppm,
         |  margin_ppm >= 1200000 AS mined
         |FROM best WHERE rnk = 1
         |ORDER BY src_id""".stripMargin
    },

    // x127: the identical Luhn fold as a list comprehension; the
    // planted payload/check-digit arithmetic mirrors the engine side
    // digit for digit.
    "x127_luhn_pii" -> {
      def luhnSum(r: String, len: String): String =
        s"CAST(list_sum([CASE WHEN ($len + 1 - i) % 2 = 0 THEN " +
          s"CASE WHEN 2 * CAST(substr($r, i, 1) AS INT) > 9 " +
          s"THEN 2 * CAST(substr($r, i, 1) AS INT) - 9 " +
          s"ELSE 2 * CAST(substr($r, i, 1) AS INT) END " +
          s"ELSE CAST(substr($r, i, 1) AS INT) END " +
          s"for i in range(1, $len + 1)]) AS BIGINT)"
      // payload sum: left index i over 15 digits, right pos 17-i even
      // ⇔ i odd — stated as (16 + 1 - i) % 2 = 0 with len fixed at 16
      val pay = luhnSum("p", "16").replace("range(1, 16 + 1)", "range(1, 16)")
      s"""WITH planted AS (
         |  SELECT doc_id, text,
         |    lpad(CAST((doc_id * 7919 + 123456789) % 1000000000000000
         |      AS VARCHAR), 15, '0') AS p
         |  FROM documents),
         |withchk AS (
         |  SELECT doc_id, text, p,
         |    (10 - ($pay % 10)) % 10 AS chk
         |  FROM planted),
         |pii AS (
         |  SELECT doc_id,
         |    text ||
         |    CASE WHEN doc_id % 3 = 0
         |      THEN ' card ' || p || CAST(chk AS VARCHAR) ELSE '' END ||
         |    CASE WHEN doc_id % 5 = 0
         |      THEN ' ref ' || p || CAST((chk + 1) % 10 AS VARCHAR)
         |      ELSE '' END AS pii_text
         |  FROM withchk),
         |runs AS (
         |  SELECT doc_id,
         |    regexp_extract_all(pii_text, '[0-9]{13,19}') AS runs
         |  FROM pii),
         |v AS (
         |  SELECT doc_id, runs,
         |    list_filter(runs, r -> ${luhnSum("r", "len(r)")} % 10 = 0)
         |      AS valid
         |  FROM runs)
         |SELECT doc_id,
         |  CAST(len(runs) AS BIGINT) AS n_runs,
         |  CAST(len(valid) AS BIGINT) AS n_valid,
         |  md5(coalesce(list_aggregate(valid, 'string_agg', ','), ''))
         |    AS valid_md5
         |FROM v
         |ORDER BY doc_id""".stripMargin
    },

    // x128: both rankings in the same floor-e6 units; the truncated
    // leg slices the first 16 dims on both sides.
    "x128_matryoshka_eval" -> {
      def cos16(a: String, b: String): String =
        s"""list_sum([$a[i] * $b[i] for i in range(1, 17)]) /
           |sqrt(list_sum([$a[i] * $a[i] for i in range(1, 17)])
           |  * list_sum([$b[i] * $b[i] for i in range(1, 17)]))""".stripMargin
      s"""WITH base AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM base
         |      WHERE vec_id < 20),
         |scored AS (
         |  SELECT query_id, vec_id,
         |    CAST(floor((${cosineSql("qv", "v")}) * 1000000 + 0.5)
         |      AS BIGINT) AS full_e6,
         |    CAST(floor((${cos16("qv", "v")}) * 1000000 + 0.5)
         |      AS BIGINT) AS low_e6
         |  FROM base, q WHERE vec_id <> query_id),
         |rf AS (
         |  SELECT query_id, vec_id, rf FROM (
         |    SELECT query_id, vec_id, CAST(row_number() OVER (
         |      PARTITION BY query_id ORDER BY full_e6 DESC, vec_id)
         |      AS BIGINT) AS rf FROM scored) WHERE rf <= 10),
         |rl AS (
         |  SELECT query_id, vec_id, rl FROM (
         |    SELECT query_id, vec_id, CAST(row_number() OVER (
         |      PARTITION BY query_id ORDER BY low_e6 DESC, vec_id)
         |      AS BIGINT) AS rl FROM scored) WHERE rl <= 10)
         |SELECT query_id, count(*) AS overlap10,
         |  CAST(sum(abs(rf - rl)) AS BIGINT) AS displacement
         |FROM rf JOIN rl USING (query_id, vec_id)
         |GROUP BY query_id
         |ORDER BY query_id""".stripMargin
    },

    // x129: identical md5 draws, identical CDF thresholds, identical
    // integer weighted mean; `//` == `div` on non-negative operands.
    "x129_poisson_bootstrap" -> {
      def hex8(e: String): String =
        s"CAST(list_sum([(strpos('0123456789abcdef', substr(md5($e), i, 1)) - 1) " +
          s"* CAST(pow(16, 8 - i) AS BIGINT) for i in range(1, 9)]) AS BIGINT)"
      s"""WITH docs AS (
         |  SELECT doc_id,
         |    CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS x
         |  FROM documents),
         |reps AS (
         |  SELECT doc_id, x, b,
         |    ${hex8("CAST(doc_id AS VARCHAR) || '#boot' || CAST(b AS VARCHAR)")}
         |      % 1000000 AS u
         |  FROM docs, (SELECT unnest(generate_series(0, 15)) AS b)),
         |w AS (
         |  SELECT b, x,
         |    CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
         |         WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
         |         WHEN u < 996340 THEN 4 ELSE 5 END AS w
         |  FROM reps),
         |means AS (
         |  SELECT CAST(b AS BIGINT) AS b,
         |    CAST(sum(w) AS BIGINT) AS n_eff,
         |    CAST(sum(w * x) * 1000000 // greatest(sum(w), 1) AS BIGINT)
         |      AS mean_ppm
         |  FROM w GROUP BY b)
         |SELECT b, n_eff, mean_ppm,
         |  CAST(row_number() OVER (ORDER BY mean_ppm, b) AS BIGINT) AS rnk
         |FROM means
         |ORDER BY b""".stripMargin
    },

    // x130: same id-value prefix boundaries, same first-doc type
    // attribution over word TRIGRAMS (the x60 shingle recipe), same
    // quantized-ln least squares (the x69 recipe).
    "x130_heaps_fit" ->
      """WITH docs AS (
        |  SELECT doc_id, t,
        |    list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                   for i in range(1, len(t) - 1)]) AS g
        |  FROM (SELECT doc_id, string_split_regex(text, '\s+') AS t
        |        FROM documents)
        |  WHERE len(t) >= 3),
        |bounds AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM docs),
        |bs AS (
        |  SELECT CAST(i AS BIGINT) AS i, lo + (hi - lo + 1) * i // 16 AS b
        |  FROM bounds, (SELECT unnest(generate_series(1, 16)) AS i)),
        |tm AS (
        |  SELECT i, CAST(sum(len(t)) AS BIGINT) AS cum_tokens
        |  FROM docs, bs WHERE doc_id < b GROUP BY i),
        |firsts AS (
        |  SELECT w, min(doc_id) AS first_doc
        |  FROM (SELECT doc_id, unnest(g) AS w FROM docs) GROUP BY w),
        |ty AS (
        |  SELECT i, count(*) AS cum_types
        |  FROM firsts, bs WHERE first_doc < b GROUP BY i),
        |pts AS (
        |  SELECT i, cum_tokens, cum_types,
        |    CAST(round(round(ln(CAST(cum_tokens AS DOUBLE)), 6) * 1e6)
        |      AS BIGINT) AS x6,
        |    CAST(round(round(ln(CAST(cum_types AS DOUBLE)), 6) * 1e6)
        |      AS BIGINT) AS y6
        |  FROM tm JOIN ty USING (i)),
        |fit AS (
        |  SELECT round(CAST(count(*) * sum(x6 * y6) - sum(x6) * sum(y6)
        |      AS DOUBLE)
        |    / CAST(count(*) * sum(x6 * x6) - sum(x6) * sum(x6) AS DOUBLE),
        |    4) AS heaps_beta
        |  FROM pts)
        |SELECT i, cum_tokens, cum_types, heaps_beta
        |FROM pts, fit
        |ORDER BY i""".stripMargin,

    // x131: the x123 sessionization verbatim, then per-turn template
    // pieces with a session-keyed cumulative-length offset; string_agg
    // with an explicit ORDER BY mirrors the engine's sort-struct
    // assembly; an all-user session aggregates spans over zero rows →
    // NULL → coalesce to '' (matching Spark's empty-array join).
    "x131_sft_render" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    lag(epoch_ms(ts)) OVER w AS prev_ms
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |b AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms > 1800000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM g),
        |sess AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM b),
        |t1 AS (
        |  SELECT user_id, session_id, ts, event_id, event_type,
        |    CAST(row_number() OVER (PARTITION BY user_id, session_id
        |      ORDER BY ts, event_id) AS BIGINT) AS rn
        |  FROM sess),
        |t3 AS (
        |  SELECT *,
        |    CASE WHEN rn % 2 = 1 THEN '<|user|> '
        |         ELSE '<|assistant|> ' END AS tag,
        |    (CASE WHEN rn % 2 = 1 THEN '<|user|> '
        |          ELSE '<|assistant|> ' END) || event_type || chr(10)
        |      AS piece
        |  FROM t1),
        |t4 AS (
        |  SELECT *,
        |    CAST(coalesce(sum(len(piece)) OVER (
        |      PARTITION BY user_id, session_id ORDER BY rn
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS off
        |  FROM t3),
        |t5 AS (
        |  SELECT *, CASE WHEN rn % 2 = 0 THEN
        |    CAST(off + len(tag) AS VARCHAR) || ':' ||
        |    CAST(off + len(piece) - 1 AS VARCHAR) END AS span
        |  FROM t4)
        |SELECT user_id, session_id, count(*) AS n_turns,
        |  CAST(sum(CASE WHEN rn % 2 = 0 THEN len(event_type) ELSE 0 END)
        |    AS BIGINT) AS masked_chars,
        |  md5(string_agg(piece, '' ORDER BY rn)) AS rendered_md5,
        |  md5(coalesce(string_agg(span, ',' ORDER BY rn), ''))
        |    AS spans_md5
        |FROM t5
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    // x132: the IDENTICAL page generation (same concatenation, same
    // (doc_id+i)%4 block variants) and the IDENTICAL extraction chain
    // — every regex is in the RE2∩Java subset, every replace literal,
    // the link-density rule integer-exact — so the md5 of the full
    // main text can only match if both engines extract the same
    // characters. &amp; decodes LAST in both.
    "x132_html_extract" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, string_split_regex(text, '\s+') AS t
        |  FROM documents),
        |page AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
        |    ' (' || lang || ')</title>' ||
        |    '<style>p{margin:0} .x{color:#00f}</style>' ||
        |    '<script type="text/javascript">var n=' ||
        |    CAST(doc_id AS VARCHAR) || ';if(n>0){n+=1;}</script></head><body>' ||
        |    '<nav><a href="/">Home</a> <a href="/about">About</a>' ||
        |    ' <a href="/contact">Contact</a></nav>' ||
        |    '<!-- rendered for ' || CAST(doc_id AS VARCHAR) || ' -->' ||
        |    array_to_string([
        |      CASE WHEN (doc_id + i) % 4 = 0 THEN
        |        '<p class="x"><a href="/l?id=' || CAST(i AS VARCHAR) || '">'
        |          || array_to_string(t[12*i+1 : 12*i+12], ' ') || '</a></p>'
        |      WHEN (doc_id + i) % 4 = 1 THEN
        |        '<p>' || array_to_string(t[12*i+1 : 12*i+12], ' ')
        |          || ' <a href="/m">see also</a></p>'
        |      ELSE '<p>' || array_to_string(t[12*i+1 : 12*i+12], ' ')
        |          || '</p>' END
        |      for i in range(0, greatest(CAST(ceil(len(t) / 12.0) AS INT), 1))
        |      ], '') ||
        |    '<p>Q&amp;A &lt;ok&gt; &quot;cited&quot;' ||
        |    ' &#39;quoted&#39;&nbsp;end of document</p>' ||
        |    '<footer><a href="/privacy">Privacy</a> &copy; 2026</footer>' ||
        |    '</body></html>' AS html
        |  FROM tok),
        |strip AS (
        |  SELECT doc_id,
        |    trim(regexp_extract(html, '(?s)<title[^>]*>(.*?)</title>', 1))
        |      AS title,
        |    regexp_extract_all(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(html,
        |              '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
        |            '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
        |          '(?s)<!--.*?-->', ' ', 'g'),
        |        '(?s)<(nav|header|footer|aside)[^>]*>.*?</(nav|header|footer|aside)>',
        |        ' ', 'g'),
        |      '(?s)<p[^>]*>(.*?)</p>', 1) AS bl
        |  FROM page),
        |keep AS (
        |  SELECT doc_id, title, bl,
        |    -- coalesce: DuckDB's array_to_string([]) is NULL where
        |    -- Spark's array_join([]) is '' — an anchor-free block must
        |    -- score 0, not NULL-drop out of the comprehension
        |    [b for b in bl if
        |      2 * length(coalesce(array_to_string(
        |            regexp_extract_all(b, '(?s)<a[^>]*>(.*?)</a>', 1), ''),
        |            ''))
        |      < length(regexp_replace(b, '<[^>]*>', '', 'g'))] AS kept
        |  FROM strip),
        |mt AS (
        |  SELECT doc_id, title,
        |    CAST(len(bl) AS BIGINT) AS n_blocks,
        |    CAST(len(kept) AS BIGINT) AS n_kept,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(replace(
        |        coalesce(array_to_string(
        |          [regexp_replace(b, '<[^>]*>', ' ', 'g') for b in kept],
        |          ' '), ''),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |        '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
        |      '\s+', ' ', 'g')) AS main
        |  FROM keep)
        |SELECT doc_id, title, n_blocks, n_kept,
        |  CAST(length(main) AS BIGINT) AS main_len,
        |  md5(main) AS main_md5,
        |  substr(main, 1, 64) AS main_head
        |FROM mt ORDER BY doc_id""".stripMargin,

    // x133: identical URL generation (same CASE arithmetic), identical
    // canonicalization (anchored RE2∩Java regexes, literal splits,
    // lexicographic param sort). eTLD+1 evaluates the published PSL
    // algorithm (exception > most-labels > implicit `*`; wildcard
    // `*.B` needs a label left of B) over the SAME bundled ICANN rule
    // list the engine parses — injected below as a 7,380-row literal
    // table straight from graft.ext.Psl's parsed sets, so engine and
    // oracle cannot drift on the data OR the algorithm.
    "x133_url_canonical" -> {
      import graft.ext.Psl
      val ruleRows = (
        Psl.exactRules.toSeq.sorted.map(s => s"('$s','x')") ++
          Psl.wildcardBases.toSeq.sorted.map(s => s"('$s','w')") ++
          Psl.exceptionRules.toSeq.sorted.map(s => s"('$s','e')")
        ).mkString(",")
      s"""WITH u AS (
        |  SELECT doc_id,
        |    (CASE doc_id % 3 WHEN 0 THEN 'HTTPS' WHEN 1 THEN 'http'
        |      ELSE 'https' END) || '://' ||
        |    (CASE doc_id % 8 WHEN 0 THEN 'WWW.Example.COM'
        |      WHEN 1 THEN 'news.example.co.uk'
        |      WHEN 2 THEN 'Blog.Sample.ORG'
        |      WHEN 3 THEN 'cdn.media.example.com'
        |      WHEN 4 THEN 'shop.example.co.uk'
        |      WHEN 5 THEN 'media.WWW.CK'
        |      WHEN 6 THEN 'a.b.zzz.Ck'
        |      ELSE 'site.pvt.K12.ma.us' END) ||
        |    (CASE doc_id % 4 WHEN 0 THEN ':443' WHEN 1 THEN ':80'
        |      WHEN 2 THEN ':8080' ELSE '' END) ||
        |    '/' || lang || '/item/' || CAST(doc_id % 97 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) ||
        |    (CASE WHEN doc_id % 2 = 0
        |      THEN '?utm_source=feed&id=' || CAST(doc_id % 50 AS VARCHAR)
        |        || '&gclid=abc' || CAST(doc_id AS VARCHAR)
        |        || '&src=' || source
        |        || '&utm_campaign=q' || CAST(doc_id % 4 AS VARCHAR)
        |      ELSE '?src=' || source || '&id=' || CAST(doc_id % 50 AS VARCHAR)
        |        || '&ref=tw' END) ||
        |    (CASE WHEN doc_id % 3 = 0
        |      THEN '#frag' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END) AS url
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id, url,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
        |      AS sch,
        |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)
        |      AS hp,
        |    regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS rawpath,
        |    regexp_extract(url, '\\?([^#]*)', 1) AS qs
        |  FROM u),
        |canon AS (
        |  SELECT doc_id, url, sch,
        |    lower(regexp_extract(hp, '^([^:]+)', 1)) AS host,
        |    regexp_extract(hp, ':([0-9]+)$$', 1) AS port,
        |    CASE WHEN rawpath = '' OR rawpath = '/' THEN '/'
        |         ELSE regexp_replace(rawpath, '/+$$', '') END AS path,
        |    list_sort([p for p in string_split(qs, '&') if p <> ''
        |      AND NOT regexp_matches(p,
        |        '^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|ref)=')]) AS params
        |  FROM parts),
        |c2 AS (
        |  SELECT doc_id, url, host,
        |    sch || '://' || host ||
        |    (CASE WHEN port = '' THEN ''
        |          WHEN sch = 'http' AND port = '80' THEN ''
        |          WHEN sch = 'https' AND port = '443' THEN ''
        |          ELSE ':' || port END) ||
        |    path ||
        |    (CASE WHEN len(params) = 0 THEN ''
        |          ELSE '?' || array_to_string(params, '&') END) AS canonical,
        |    string_split(host, '.') AS ls
        |  FROM canon),
        |rules(suffix, kind) AS (VALUES $ruleRows),
        |hosts AS (SELECT DISTINCT host, ls, len(ls) AS n FROM c2),
        |cand AS (
        |  SELECT host, n, L,
        |    array_to_string(ls[n - L + 1:n], '.') AS suf
        |  FROM hosts, range(1, 5) t(L) WHERE n >= L),
        |m AS (
        |  SELECT c.host,
        |    max(CASE WHEN r.kind = 'e' THEN c.L - 1 END) AS exc_ps,
        |    max(CASE WHEN r.kind = 'x' THEN c.L
        |             WHEN r.kind = 'w' AND c.n > c.L THEN c.L + 1 END)
        |      AS norm_ps
        |  FROM cand c JOIN rules r ON c.suf = r.suffix
        |  GROUP BY c.host),
        |e1 AS (
        |  SELECT h.host,
        |    CASE WHEN h.n <= coalesce(m.exc_ps, m.norm_ps, 1) THEN h.host
        |         ELSE array_to_string(
        |           h.ls[h.n - coalesce(m.exc_ps, m.norm_ps, 1):h.n], '.')
        |    END AS etld1
        |  FROM hosts h LEFT JOIN m ON h.host = m.host)
        |SELECT c2.doc_id, c2.url, c2.canonical, e1.etld1,
        |  CAST(count(*) OVER (PARTITION BY c2.host) AS BIGINT)
        |    AS n_host_docs
        |FROM c2 JOIN e1 ON c2.host = e1.host
        |ORDER BY doc_id""".stripMargin
    },

    // x114: same ppm shares, pow(·, 0.5) through the round-6 lift.
    "x114_temperature_mix" ->
      """WITH stats AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT)
        |      AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM stats),
        |p AS (
        |  SELECT source, n_docs, n_tokens,
        |    (n_tokens * 1000000) // tot AS p_ppm,
        |    CAST(round(round(pow(CAST((n_tokens * 1000000) // tot
        |      AS DOUBLE) / 1e6, 0.5), 6) * 1e6) AS BIGINT) AS pw_e6
        |  FROM stats, tot),
        |z AS (SELECT CAST(sum(pw_e6) AS BIGINT) AS z FROM p)
        |SELECT source, n_docs, n_tokens, p_ppm, pw_e6,
        |  (pw_e6 * 1000000) // z AS w_ppm,
        |  ((pw_e6 * 1000000) // z) * 1000000 // greatest(p_ppm, 1)
        |    AS epochs_ppm
        |FROM p, z
        |ORDER BY source""".stripMargin,
  )

  /** Unrolled integer Bradley-Terry MM oracle mirroring
    * x106_bradley_terry: the same md5-uniform judgments, pair
    * aggregation, e12 integer denominators (order-free integer sums),
    * ghost-game regularization and strength floor -- every round's
    * strengths are bit-identical across engines by construction.
    */
  /** Unrolled integer water-filling oracle mirroring x117: each round
    * re-splits the un-capped budget by √p weight and freezes sources
    * whose tentative allocation reaches the 2-epoch cap — the same
    * fixed round count in both engines, so allocations are
    * bit-identical whether or not a round still moves mass.
    */
  private def cappedMixSql(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { k =>
      s"""s_$k AS (
         |  SELECT CAST(coalesce(sum(CASE WHEN capped THEN cap_tokens END), 0)
         |      AS BIGINT) AS capsum,
         |    greatest(CAST(coalesce(sum(CASE WHEN NOT capped THEN pw_e6 END),
         |      0) AS BIGINT), 1) AS zsum
         |  FROM r_${k - 1}),
         |r_$k AS (
         |  SELECT source, n_tokens, pw_e6, cap_tokens, budget,
         |    capped OR tent >= cap_tokens AS capped,
         |    CASE WHEN capped OR tent >= cap_tokens THEN cap_tokens
         |         ELSE tent END AS alloc_tokens
         |  FROM (
         |    SELECT r.*, CASE WHEN r.capped THEN CAST(0 AS BIGINT)
         |      ELSE (r.pw_e6 * (r.budget - s.capsum)) // s.zsum END AS tent
         |    FROM r_${k - 1} r, s_$k s))""".stripMargin
    }.mkString(",\n")
    s"""WITH stats AS (
       |  SELECT source,
       |    CAST(sum(len(string_split_regex(text, '\\s+'))
       |      * (1 + CAST(substr(source, 4) AS BIGINT) % 5)) AS BIGINT)
       |      AS n_tokens
       |  FROM documents GROUP BY source),
       |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM stats),
       |base AS (
       |  SELECT source, n_tokens,
       |    CAST(round(round(pow(CAST((n_tokens * 1000000) // total
       |      AS DOUBLE) / 1e6, 0.5), 6) * 1e6) AS BIGINT) AS pw_e6,
       |    n_tokens * 2 AS cap_tokens,
       |    (total * 3) // 2 AS budget
       |  FROM stats, tot),
       |r_0 AS (
       |  SELECT source, n_tokens, pw_e6, cap_tokens, budget,
       |    FALSE AS capped, CAST(0 AS BIGINT) AS alloc_tokens
       |  FROM base),
       |$roundCtes
       |SELECT source, n_tokens, pw_e6, cap_tokens, alloc_tokens,
       |  (alloc_tokens * 1000000) // n_tokens AS epochs_ppm, capped
       |FROM r_$rounds
       |ORDER BY source""".stripMargin
  }

  private def bradleyTerrySql(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""d_$k AS (
         |  SELECT item, CAST(sum(d) AS BIGINT) AS dsum FROM (
         |    SELECT p.lo AS item,
         |      (p.n * 1000000000000) // (a.s_e6 + b.s_e6) AS d
         |    FROM pairs p
         |    JOIN s_${k - 1} a ON a.item = p.lo
         |    JOIN s_${k - 1} b ON b.item = p.hi
         |    UNION ALL
         |    SELECT p.hi,
         |      (p.n * 1000000000000) // (a.s_e6 + b.s_e6)
         |    FROM pairs p
         |    JOIN s_${k - 1} a ON a.item = p.lo
         |    JOIN s_${k - 1} b ON b.item = p.hi)
         |  GROUP BY item),
         |s_$k AS (
         |  SELECT i.item,
         |    greatest(((i.wins + 1) * 1000000000000) //
         |      (coalesce(d.dsum, 0)
         |       + (2000000000000 // (s.s_e6 + 1000000))), 1) AS s_e6
         |  FROM items i
         |  LEFT JOIN d_$k d ON d.item = i.item
         |  JOIN s_${k - 1} s ON s.item = i.item)""".stripMargin
    }.mkString(",\n")
    s"""WITH g AS (
       |  SELECT doc_id, doc_id % 100 AS ia, (doc_id * 31 + 7) % 100 AS ib,
       |    CAST(list_sum([(strpos('0123456789abcdef',
       |                     substr(md5(CAST(doc_id AS VARCHAR) || '#bt'),
       |                       i, 1)) - 1)
       |                    * CAST(pow(16, 8 - i) AS BIGINT)
       |                    for i in range(1, 9)]) AS BIGINT) % 1000000
       |      AS u_ppm
       |  FROM documents
       |  WHERE doc_id % 100 <> (doc_id * 31 + 7) % 100),
       |w AS (
       |  SELECT least(ia, ib) AS lo, greatest(ia, ib) AS hi,
       |    CASE WHEN (u_ppm * (ia + ib + 2) < (ia + 1) * 1000000)
       |              = (ia = least(ia, ib)) THEN 1 ELSE 0 END AS lo_win
       |  FROM g),
       |pairs AS (
       |  SELECT lo, hi, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(lo_win) AS BIGINT) AS w_lo
       |  FROM w GROUP BY lo, hi),
       |items AS (
       |  SELECT item, CAST(sum(w) AS BIGINT) AS wins,
       |    CAST(sum(n) AS BIGINT) AS games
       |  FROM (
       |    SELECT lo AS item, w_lo AS w, n FROM pairs
       |    UNION ALL
       |    SELECT hi, n - w_lo, n FROM pairs)
       |  GROUP BY item),
       |s_0 AS (SELECT item, CAST(1000000 AS BIGINT) AS s_e6 FROM items),
       |$rounds
       |SELECT i.item, i.games, i.wins, s.s_e6,
       |  CAST(row_number() OVER (ORDER BY s.s_e6 DESC, i.item) AS BIGINT)
       |    AS rnk
       |FROM items i JOIN s_$iters s ON s.item = i.item
       |ORDER BY i.item""".stripMargin
  }

  /** Unrolled deterministic power-iteration oracle ([[graft.ext
    * .PowerIter]] arithmetic as CTEs): v_0 = 1/√dims; per round,
    * t = v·v_k, per-dim integer sum of round(x_d·t·2^24), w = s/2^24,
    * v_{k+1} = w/‖w‖; final scores = 6-decimal projection + residual,
    * top-20 by |projection|.
    */
  private def powerIterSql(dims: Int, iters: Int): String = {
    def dot(v: String, u: String) =
      s"list_sum([$v[i] * $u[i] for i in range(1, ${dims + 1})])"
    val iterCtes = (1 to iters).map { k =>
      s"""t_$k AS (
         |  SELECT p.vec_id, p.v, ${dot("p.v", "c.vv")} AS t
         |  FROM pts p, v_${k - 1} c),
         |u_$k AS (
         |  SELECT r.i AS dim,
         |    CAST(sum(CAST(round(t.v[r.i] * t.t * 16777216.0) AS BIGINT))
         |      AS BIGINT) AS s
         |  FROM t_$k t, range(1, ${dims + 1}) r(i)
         |  GROUP BY r.i),
         |w_$k AS (
         |  SELECT list(CAST(s AS DOUBLE) / 16777216.0 ORDER BY dim) AS wv
         |  FROM u_$k),
         |v_$k AS (
         |  SELECT [x / sqrt(list_sum([y * y for y in wv])) for x in wv]
         |    AS vv
         |  FROM w_$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH pts AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |v_0 AS (
       |  SELECT [1.0 / sqrt(${dims}.0) for i in range(1, ${dims + 1})]
       |    AS vv),
       |$iterCtes,
       |sc AS (
       |  SELECT p.vec_id, round(${dot("p.v", "c.vv")}, 6) AS proj6,
       |    list_sum([x * x for x in p.v]) AS n2
       |  FROM pts p, v_$iters c),
       |sc2 AS (
       |  SELECT vec_id, proj6, round(n2 - proj6 * proj6, 6) AS resid6,
       |    abs(proj6) AS ap
       |  FROM sc),
       |r AS (
       |  SELECT vec_id, proj6, resid6,
       |    CAST(row_number() OVER (ORDER BY ap DESC, vec_id) AS BIGINT)
       |      AS rnk
       |  FROM sc2)
       |SELECT rnk, vec_id, proj6, resid6 FROM r WHERE rnk <= 20
       |ORDER BY rnk""".stripMargin
  }

  /** Shared 1-iteration quantized-k-means CTE block over the raw
    * embeddings table (the kmeansIvfSql arithmetic, factored for the
    * ops that need only the final assignment): defines `base`, `pts`,
    * `c_0`…`c_1` and `asg(vec_id, cell, d)` where d is the squared
    * distance to the assigned (argmin, ties-to-lowest) centroid.
    *
    * `fitWhere`: optional predicate (over unaliased `pts` columns)
    * restricting which points the centroid FIT sees — seeds, the
    * Lloyd assignment and the mean update all ignore excluded rows,
    * while the final `asg` assignment still covers EVERY point. This
    * is the frozen-index shape x75 verifies: the index is built from
    * the old corpus, then new arrivals are assigned to it unchanged.
    * Empty (the default) emits byte-identical SQL to the pre-x75
    * builder, so the frozen x09/x16/x58/x72/x73 oracles are untouched.
    */
  private def kmeans1Sql(k: Int, dims: Int, fitWhere: String = ""): String =
    kmeans1SqlK(k.toString, dims, fitWhere)

  /** The deployment k∝corpus discipline (round-10 verdict task #5) as
    * SQL: cells = max(1, ceil(fit-corpus-rows / 500)) — the same value
    * [[corpusK]] derives on the engine side, stated as a scalar
    * subquery so the oracle scales its cell count with the data
    * exactly like the engine does.
    */
  private def derivedKSql(fitFrom: String): String =
    s"(SELECT greatest(1, CAST(ceil(count(*) / 500.0) AS BIGINT)) FROM $fitFrom)"

  private def kmeans1SqlK(kSql: String, dims: Int,
      fitWhere: String = ""): String = {
    def d2(v: String, cv: String): String =
      s"list_sum([($v[i] - $cv[i]) * ($v[i] - $cv[i]) for i in range(1, ${dims + 1})])"
    val k = kSql
    val w0 = if (fitWhere.isEmpty) "" else s" WHERE $fitWhere"
    val w1 = if (fitWhere.isEmpty) ""
      else s" WHERE ${fitWhere.replace("vec_id", "p.vec_id")}"
    s"""base AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |pts AS (
       |  SELECT vec_id, v,
       |    [CAST(round(x * 16777216.0) AS BIGINT) for x in v] AS q
       |  FROM base),
       |c_0 AS (
       |  SELECT cell, cv FROM (
       |    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
       |    FROM pts$w0)
       |  WHERE cell < $k),
       |a_1 AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT p.vec_id, c.cell,
       |      row_number() OVER (PARTITION BY p.vec_id
       |                         ORDER BY ${d2("p.v", "c.cv")}, c.cell) AS rn
       |    FROM pts p, c_0 c$w1)
       |  WHERE rn = 1),
       |m_1 AS (
       |  SELECT a.cell, r.i AS dim,
       |    floor(CAST(sum(p.q[r.i]) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS ms
       |  FROM a_1 a JOIN pts p USING (vec_id), range(1, ${dims + 1}) r(i)
       |  GROUP BY a.cell, r.i),
       |cm_1 AS (
       |  SELECT cell, list(ms / 16777216.0 ORDER BY dim) AS cv
       |  FROM m_1 GROUP BY cell),
       |c_1 AS (
       |  SELECT p.cell, COALESCE(n.cv, p.cv) AS cv
       |  FROM c_0 p LEFT JOIN cm_1 n USING (cell)),
       |asg AS (
       |  SELECT vec_id, cell, d FROM (
       |    SELECT p.vec_id, c.cell, ${d2("p.v", "c.cv")} AS d,
       |      row_number() OVER (PARTITION BY p.vec_id
       |                         ORDER BY ${d2("p.v", "c.cv")}, c.cell) AS rn
       |    FROM pts p, c_1 c)
       |  WHERE rn = 1)""".stripMargin
  }

  /** PQ-ADC oracle: per-subspace unrolled quantized k-means (the
    * kmeansIvfSql arithmetic on vector slices), database vectors
    * encoded to per-subspace argmin codes, queries ranked by the
    * 6-decimal-rounded sum of per-subspace LUT distances.
    */
  private def pqAdcSql(
      m: Int, sub: Int, k: Int, topK: Int, nQueries: Int): String = {
    def d2(v: String, cv: String): String =
      s"list_sum([($v[i] - $cv[i]) * ($v[i] - $cv[i]) for i in range(1, ${sub + 1})])"
    def sl(j: Int) = s"[${j * sub + 1}:${(j + 1) * sub}]"
    val subCtes = (0 until m).map { j =>
      s"""p_$j AS (
         |  SELECT vec_id, v${sl(j)} AS v,
         |    [CAST(round(x * 16777216.0) AS BIGINT) for x in v${sl(j)}] AS q
         |  FROM base),
         |c0_$j AS (
         |  SELECT cell, cv FROM (
         |    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
         |    FROM p_$j)
         |  WHERE cell < $k),
         |a1_$j AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT p.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY p.vec_id
         |                         ORDER BY ${d2("p.v", "c.cv")}, c.cell) AS rn
         |    FROM p_$j p, c0_$j c)
         |  WHERE rn = 1),
         |m1_$j AS (
         |  SELECT a.cell, r.i AS dim,
         |    floor(CAST(sum(p.q[r.i]) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS ms
         |  FROM a1_$j a JOIN p_$j p USING (vec_id), range(1, ${sub + 1}) r(i)
         |  GROUP BY a.cell, r.i),
         |cm1_$j AS (
         |  SELECT cell, list(ms / 16777216.0 ORDER BY dim) AS cv
         |  FROM m1_$j GROUP BY cell),
         |c1_$j AS (
         |  SELECT p.cell, COALESCE(n.cv, p.cv) AS cv
         |  FROM c0_$j p LEFT JOIN cm1_$j n USING (cell)),
         |code_$j AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT p.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY p.vec_id
         |                         ORDER BY ${d2("p.v", "c.cv")}, c.cell) AS rn
         |    FROM p_$j p, c1_$j c)
         |  WHERE rn = 1),
         |lut_$j AS (
         |  SELECT b.vec_id AS query_id, c.cell,
         |    ${d2(s"b.v${sl(j)}", "c.cv")} AS d
         |  FROM base b, c1_$j c WHERE b.vec_id < $nQueries)""".stripMargin
    }.mkString(",\n")
    val codeJoins = (0 until m)
      .map(j => s"JOIN code_$j USING (vec_id)").mkString(" ")
    val codeCols = (0 until m)
      .map(j => s"code_$j.cell AS code_$j").mkString(", ")
    val lutJoins = (0 until m).map(j =>
      s"JOIN lut_$j l$j ON l$j.query_id = q.query_id AND l$j.cell = cd.code_$j")
      .mkString("\n  ")
    val adcSum = (0 until m).map(j => s"l$j.d").mkString(" + ")
    s"""WITH base AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |$subCtes,
       |codes AS (
       |  SELECT vec_id, $codeCols
       |  FROM base $codeJoins),
       |qids AS (SELECT DISTINCT query_id FROM lut_0),
       |adc AS (
       |  SELECT q.query_id, cd.vec_id AS neighbor_id,
       |    round($adcSum, 6) AS adc_d2
       |  FROM qids q CROSS JOIN codes cd
       |  $lutJoins
       |  WHERE cd.vec_id <> q.query_id),
       |r AS (
       |  SELECT query_id, neighbor_id, adc_d2,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |                            ORDER BY adc_d2, neighbor_id) AS BIGINT) AS rnk
       |  FROM adc)
       |SELECT query_id, rnk, neighbor_id, adc_d2
       |FROM r WHERE rnk <= $topK
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** IVF+PQ composed-index oracle (x72): the coarse leg is kmeans1Sql's
    * 1-iteration fit + final assignment verbatim; the PQ leg is
    * pqAdcSql's per-subspace CTEs verbatim; the shortlist is one
    * equi-join on the coarse cell; the exact leg is the brute-force
    * squared-distance top-k (the same left-fold summation order as
    * KMeansLite.dist2). exact_hit marks ADC results that appear in the
    * exact top-k — recall@k is its per-query mean.
    */
  private def ivfPqSql(
      kc: Int, dims: Int, m: Int, sub: Int, kq: Int,
      nProbe: Int, topK: Int, nQueries: Int,
      audit: Boolean = true): String = {
    def d2c(v: String, cv: String): String =
      s"list_sum([($v[i] - $cv[i]) * ($v[i] - $cv[i]) for i in range(1, ${dims + 1})])"
    def d2s(v: String, cv: String): String =
      s"list_sum([($v[i] - $cv[i]) * ($v[i] - $cv[i]) for i in range(1, ${sub + 1})])"
    def sl(j: Int) = s"[${j * sub + 1}:${(j + 1) * sub}]"
    val subCtes = (0 until m).map { j =>
      s"""p_$j AS (
         |  SELECT vec_id, v${sl(j)} AS v,
         |    [CAST(round(x * 16777216.0) AS BIGINT) for x in v${sl(j)}] AS q
         |  FROM base),
         |c0_$j AS (
         |  SELECT cell, cv FROM (
         |    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
         |    FROM p_$j)
         |  WHERE cell < $kq),
         |a1_$j AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT p.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY p.vec_id
         |                         ORDER BY ${d2s("p.v", "c.cv")}, c.cell) AS rn
         |    FROM p_$j p, c0_$j c)
         |  WHERE rn = 1),
         |m1_$j AS (
         |  SELECT a.cell, r.i AS dim,
         |    floor(CAST(sum(p.q[r.i]) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS ms
         |  FROM a1_$j a JOIN p_$j p USING (vec_id), range(1, ${sub + 1}) r(i)
         |  GROUP BY a.cell, r.i),
         |cm1_$j AS (
         |  SELECT cell, list(ms / 16777216.0 ORDER BY dim) AS cv
         |  FROM m1_$j GROUP BY cell),
         |c1_$j AS (
         |  SELECT p.cell, COALESCE(n.cv, p.cv) AS cv
         |  FROM c0_$j p LEFT JOIN cm1_$j n USING (cell)),
         |code_$j AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT p.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY p.vec_id
         |                         ORDER BY ${d2s("p.v", "c.cv")}, c.cell) AS rn
         |    FROM p_$j p, c1_$j c)
         |  WHERE rn = 1),
         |lut_$j AS (
         |  SELECT b.vec_id AS query_id, c.cell,
         |    ${d2s(s"b.v${sl(j)}", "c.cv")} AS d
         |  FROM base b, c1_$j c WHERE b.vec_id < $nQueries)""".stripMargin
    }.mkString(",\n")
    val codeJoins = (0 until m)
      .map(j => s"JOIN code_$j USING (vec_id)").mkString(" ")
    val codeCols = (0 until m)
      .map(j => s"code_$j.cell AS code_$j").mkString(", ")
    val lutJoins = (0 until m).map(j =>
      s"JOIN lut_$j l$j ON l$j.query_id = qd.query_id AND l$j.cell = cd.code_$j")
      .mkString("\n  ")
    val adcSum = (0 until m).map(j => s"l$j.d").mkString(" + ")
    s"""WITH ${kmeans1Sql(kc, dims)},
       |qd AS (
       |  SELECT query_id, cell FROM (
       |    SELECT q.vec_id AS query_id, c.cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |                         ORDER BY ${d2c("q.v", "c.cv")}, c.cell) AS cr
       |    FROM base q, c_1 c WHERE q.vec_id < $nQueries)
       |  WHERE cr <= $nProbe),
       |$subCtes,
       |codes AS (
       |  SELECT asg.vec_id, asg.cell, $codeCols
       |  FROM asg $codeJoins),
       |adc AS (
       |  SELECT qd.query_id, cd.vec_id AS neighbor_id,
       |    round($adcSum, 6) AS adc_d2
       |  FROM qd JOIN codes cd USING (cell)
       |  $lutJoins
       |  WHERE cd.vec_id <> qd.query_id),
       |approx AS (
       |  SELECT query_id, neighbor_id, adc_d2,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |                            ORDER BY adc_d2, neighbor_id) AS BIGINT) AS rnk
       |  FROM adc)${if (audit) s""",
       |ex AS (
       |  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    round(${d2c("q.v", "b.v")}, 6) AS ed6
       |  FROM base b, base q
       |  WHERE q.vec_id < $nQueries AND b.vec_id <> q.vec_id),
       |exact5 AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |                         ORDER BY ed6, neighbor_id) AS ernk
       |    FROM ex)
       |  WHERE ernk <= $topK)
       |SELECT a.query_id, a.rnk, a.neighbor_id, a.adc_d2,
       |  (e.neighbor_id IS NOT NULL) AS exact_hit
       |FROM approx a LEFT JOIN exact5 e USING (query_id, neighbor_id)""" else s"""
       |SELECT a.query_id, a.rnk, a.neighbor_id, a.adc_d2
       |FROM approx a"""}
       |WHERE a.rnk <= $topK
       |ORDER BY a.query_id, a.rnk""".stripMargin
  }

  /** SemDeDup oracle: planted 2^-10-grid variants, one quantized
    * k-means iteration (the kmeansIvfSql arithmetic — exact 2^24
    * quantization, integer sums, floor division, ties to the lowest
    * cell), within-cell cosine pairs at τ=0.99 on 6-decimal-rounded
    * cosine, then x23's recursive min-label reachability.
    */
  private def semDedupSql(kSql: String, dims: Int): String = {
    val k = kSql
    def d2(v: String, cv: String): String =
      s"list_sum([($v[i] - $cv[i]) * ($v[i] - $cv[i]) for i in range(1, ${dims + 1})])"
    s"""WITH RECURSIVE base AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |corpus AS (
       |  SELECT vec_id, v FROM base
       |  UNION ALL
       |  SELECT vec_id + 100000, [round(x * 1024) / 1024 for x in v]
       |  FROM base),
       |pts AS (
       |  SELECT vec_id, v,
       |    [CAST(round(x * 16777216.0) AS BIGINT) for x in v] AS q
       |  FROM corpus),
       |c_0 AS (
       |  SELECT cell, cv FROM (
       |    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
       |    FROM pts)
       |  WHERE cell < $k),
       |a_1 AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT p.vec_id, c.cell,
       |      row_number() OVER (PARTITION BY p.vec_id
       |                         ORDER BY ${d2("p.v", "c.cv")}, c.cell) AS rn
       |    FROM pts p, c_0 c)
       |  WHERE rn = 1),
       |m_1 AS (
       |  SELECT a.cell, r.i AS dim,
       |    floor(CAST(sum(p.q[r.i]) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS ms
       |  FROM a_1 a JOIN pts p USING (vec_id), range(1, ${dims + 1}) r(i)
       |  GROUP BY a.cell, r.i),
       |cm_1 AS (
       |  SELECT cell, list(ms / 16777216.0 ORDER BY dim) AS cv
       |  FROM m_1 GROUP BY cell),
       |c_1 AS (
       |  SELECT p.cell, COALESCE(n.cv, p.cv) AS cv
       |  FROM c_0 p LEFT JOIN cm_1 n USING (cell)),
       |a_2 AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT p.vec_id, c.cell,
       |      row_number() OVER (PARTITION BY p.vec_id
       |                         ORDER BY ${d2("p.v", "c.cv")}, c.cell) AS rn
       |    FROM pts p, c_1 c)
       |  WHERE rn = 1),
       |cells AS (
       |  SELECT a.vec_id, a.cell, p.v FROM a_2 a JOIN pts p USING (vec_id)),
       |edges AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM cells a JOIN cells b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE round(${cosineSql("a.v", "b.v")}, 6) >= 0.99),
       |sym AS (
       |  SELECT id_a AS src, id_b AS dst FROM edges
       |  UNION ALL SELECT id_b, id_a FROM edges),
       |reach(id, m) AS (
       |  SELECT vec_id, vec_id FROM corpus
       |  UNION
       |  SELECT s.dst, r.m FROM reach r JOIN sym s ON s.src = r.id),
       |comp AS (SELECT id AS vec_id, min(m) AS cluster_id FROM reach GROUP BY id),
       |sizes AS (
       |  SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
       |SELECT c.vec_id, c.cluster_id, s.cluster_size,
       |  (c.vec_id = c.cluster_id) AS keep
       |FROM comp c JOIN sizes s USING (cluster_id)
       |ORDER BY c.vec_id""".stripMargin
  }
}
