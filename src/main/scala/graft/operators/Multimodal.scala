package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Tier C6 multimodal columns: opaque binary payloads + typed metadata
  * structs riding alongside text/embedding columns.
  *
  * Real decode libraries (image/audio codecs) are not in this
  * environment, so the decode step is a clearly-marked deterministic
  * fake — but the Spark-side plumbing is real: BinaryType columns,
  * metadata structs, per-row feature extraction as codegen'd
  * expressions, and partition-parallel batch shape. Swapping the fake
  * for a real codec is a one-function change (see [[fakeDecode]]).
  *
  * Scale notes: payloads stay columnar (BinaryType in parquet) and are
  * never collected; feature extraction is per-row and shuffle-free, so
  * it scales linearly with executors. For very large blobs the
  * production layout stores payloads in object storage and keeps
  * (uri, byte_range) here — same schema shape, same code.
  */
object Multimodal {

  /** STUB decode: stands in for an image decoder. Derives deterministic
    * pseudo-metadata (width/height/channels) from payload bytes — the
    * real implementation would parse the codec header instead. */
  private def fakeDecode(payload: org.apache.spark.sql.Column) = struct(
    length(payload).as("n_bytes"),
    (pmod(xxhash64(payload), lit(1280L)) + 1).as("width"),
    (pmod(xxhash64(payload, lit(1)), lit(720L)) + 1).as("height"),
    (pmod(xxhash64(payload, lit(2)), lit(3L)) + 1).as("channels"))

  /** Build a multimodal table: text docs + synthesized binary payload +
    * decoded metadata struct; project typed fields out of the struct.
    * (Payload = utf-8 bytes of the text — deterministic and faithful
    * Spark plumbing; a real pipeline reads the bytes from storage.) */
  def m01MultimodalMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select($"doc_id", encode($"text", "utf-8").as("payload"))
      .withColumn("meta", fakeDecode($"payload"))
      .select(
        $"doc_id",
        $"meta.n_bytes".as("n_bytes"),
        $"meta.width".as("width"),
        $"meta.height".as("height"),
        $"meta.channels".as("channels"),
        ($"meta.width" * $"meta.height" * $"meta.channels").as("n_pixels"))
  }

  /** Oracle covers the engine-neutral part (payload byte length); the
    * xxhash64-derived fake fields are Spark-specific, so they are
    * checked in ScalaTest instead — this query's oracle-facing twin
    * below projects only the neutral columns. */
  def m02PayloadBytes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select($"doc_id", length(encode($"text", "utf-8")).as("n_bytes"),
        substring(hex(encode($"text", "utf-8")), 1, 16).as("payload_prefix_hex"))
  }

  val m02Sql: String =
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |  substr(upper(hex(encode(text))), 1, 16) AS payload_prefix_hex
      |FROM documents""".stripMargin

  /** Frame-sampling shape: explode a payload into fixed-size chunks
    * (stands in for video frame extraction / audio windowing). Chunk
    * boundaries and per-chunk sizes are engine-neutral. */
  def m03ChunkSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val chunk = 100
    documents(s, d)
      .select($"doc_id", $"text", encode($"text", "utf-8").as("payload"))
      .select($"doc_id", length($"payload").as("n_bytes"),
        posexplode(split($"text", s"(?<=\\G.{$chunk})")))
      .toDF("doc_id", "n_bytes", "chunk_id", "chunk")
      .select($"doc_id", $"n_bytes", $"chunk_id", length($"chunk").as("chunk_len"))
  }

  /** Typed batched-decode pipeline — the Scala analogue of a
    * `mapInPandas` decode stage: one expensive "codec" is initialized
    * per partition (not per row), rows stream through it in batches,
    * and the output schema is a typed case class. The codec here is the
    * deterministic stub; a real implementation would wrap an image/
    * audio library handle. */
  final case class DecodedDoc(doc_id: Long, n_bytes: Int, checksum: Long)

  def decodeBatched(s: SparkSession, d: String): org.apache.spark.sql.Dataset[DecodedDoc] = {
    import s.implicits._
    documents(s, d)
      .select($"doc_id", encode($"text", "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init (the expensive part a real decoder has)
        val codec = new java.util.zip.CRC32()
        it.map { case (id, payload) =>
          codec.reset()
          codec.update(payload)
          DecodedDoc(id, payload.length, codec.getValue)
        }
      }
  }

  /** Resize stage (stub): cap each payload at a byte budget — the
    * plumbing shape of an image-resize/audio-downsample pass (payload
    * in, smaller payload + updated metadata out). Truncation stands in
    * for the codec transform; the byte-level semantics are engine-
    * neutral and oracle-checked. */
  def m04ResizeStub(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val budget = 200
    documents(s, d)
      .select($"doc_id", encode($"text", "utf-8").as("payload"))
      .select($"doc_id",
        length($"payload").as("orig_bytes"),
        substring($"payload", 1, budget).as("resized"))
      .select($"doc_id", $"orig_bytes",
        length($"resized").as("resized_bytes"),
        ($"orig_bytes" > budget).as("was_truncated"),
        substring(hex($"resized"), 1, 16).as("resized_prefix_hex"))
  }

  val m04Sql: String =
    """SELECT doc_id,
      |  octet_length(encode(text)) AS orig_bytes,
      |  LEAST(octet_length(encode(text)), 200) AS resized_bytes,
      |  octet_length(encode(text)) > 200 AS was_truncated,
      |  substr(upper(hex(encode(text))), 1, 16) AS resized_prefix_hex
      |FROM documents""".stripMargin

  /** m05: byte-exact payload deduplication — the multimodal twin of
    * d01. Images/audio recrawled from mirrors are byte-identical far
    * more often than text is (no boilerplate injection), so a content-
    * hash group over the BINARY column is the first multimodal dedup
    * pass of any pipeline. One shuffle on a 256-bit hash — uniform by
    * construction, payload skew cannot skew it; payload bytes never
    * cross the shuffle (only hash + id do, after the partial agg). */
  def m05PayloadDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select($"doc_id", encode($"text", "utf-8").as("payload"))
      .groupBy(sha2($"payload", 256).as("payload_sha256"))
      .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("keep_id"))
  }

  /** DuckDB's sha256 takes VARCHAR (hashing its UTF-8 bytes) — the
    * same bytes Spark's sha2(encode(text,'utf-8'), 256) hashes. */
  val m05Sql: String =
    """SELECT sha256(text) AS payload_sha256,
      |  COUNT(*) AS n_copies, MIN(doc_id) AS keep_id
      |FROM documents
      |GROUP BY 1""".stripMargin

  /** m06: block-level near-dup for binary payloads — the multimodal
    * step between m05's byte-exact pass (misses any re-encode or
    * append) and embedding-space near-dup (needs a decoder + model).
    * The payload is cut into fixed 64-byte blocks; two payloads are
    * near-dups when the Jaccard over their distinct block sets
    * ≥ 0.5 — catching truncated re-uploads, metadata-stamped copies
    * and concatenated variants of the same asset.
    *
    * Fixed-offset blocking is deliberately the cheap v1 (one
    * substring pass, zero state): a single inserted byte shifts every
    * later block, which is exactly what content-defined chunking
    * (rolling-hash cut points, as in LBFS/restic) fixes — that drops
    * in here by replacing the block iterator, leaving the join
    * unchanged. Scale shape is d03's: block table linear in corpus
    * bytes / 64, candidates from an equi-join on the block value
    * (content-hash-uniform keys), per-pair verification by counting —
    * never an all-pairs comparison. Payload bytes never shuffle as a
    * whole; only 64-byte blocks + ids do. The candidate join runs
    * under the two payload-storm guards of [[collapsedChunkSetPairs]]
    * (byte-exact collapse + chunk df-cap). */
  def m06ChunkNearDup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    chunkNearDupPairs(
      documents(s, d).select($"doc_id", encode($"text", "utf-8").as("payload")),
      0.5)
  }

  /** Chunk-document-frequency cap of the registered payload near-dup
    * entries: a chunk value present in more than this many DISTINCT
    * payloads is excluded from the Jaccard universe (numerator AND
    * denominators). Such a chunk is shared boilerplate by construction
    * — zero-padding blocks, container headers, common EXIF runs — and
    * carries ~no resemblance signal while making the inverted-index
    * join quadratic in its document frequency. 64 is ~5× the largest
    * honest df observed on the fixtures (14 at sf0.1), so the cap
    * never fires there and the entries stay oracle-exact; at 100 TB it
    * bounds every join key's candidate mass at maxDf·(maxDf−1)/2. */
  val PayloadChunkMaxDf: Long = 64L

  /** The block-set join over any (doc_id, payload: binary) frame —
    * see [[m06ChunkNearDup]] and the guards in
    * [[collapsedChunkSetPairs]]. */
  def chunkNearDupPairs(payloads: DataFrame, threshold: Double,
                        maxDf: Long = PayloadChunkMaxDf): DataFrame = {
    val s = payloads.sparkSession
    import s.implicits._
    collapsedChunkSetPairs(payloads, keyed => {
      val h = keyed.select($"sha", hex($"payload").as("hx"))
        .filter(length($"hx") > 0)
      // 64 payload bytes = 128 hex chars; blocks per distinct payload
      val nch = ceil(length($"hx") / lit(128.0)).cast("long")
      h.select($"sha", $"hx", explode(sequence(lit(0L), nch - 1)).as("i"))
        .select($"sha",
          expr("substring(hx, cast(i * 128 + 1 as int), 128)").as("ck"))
    }, threshold, maxDf, identity, "block_jaccard")
  }

  /** Collapse → cap → score → expand: the shared scale harness of the
    * payload near-dup family (m06's fixed blocks, m12's CDC chunks) —
    * Jaccard over distinct chunk sets via an inverted-index equi-join,
    * with the two guards that keep that join linear under the payload
    * storms a real media corpus carries:
    *
    *  1. BYTE-EXACT COLLAPSE (the d10 precedent): payloads are grouped
    *     by sha-256 and each distinct payload is chunked/joined ONCE.
    *     Answer-preserving by construction — identical payloads have
    *     identical chunk sets, so every member pair reconstructs
    *     exactly in the expand step (cross-group pairs inherit their
    *     rep pair's score; within-group pairs score exactly 1.0, the
    *     value the join would compute). A million re-uploads of one
    *     asset cost one join row instead of a 10^12-row key storm.
    *  2. CHUNK DF-CAP (the lshCandidates precedent, df-keyed): chunk
    *     values in more than `maxDf` DISTINCT payloads are dropped
    *     from the Jaccard universe — numerator and denominators both,
    *     so the score stays a true Jaccard over the surviving (non-
    *     boilerplate) chunk vocabulary. Drop semantics are explicit:
    *     a pair sharing ONLY flooded chunks is not emitted (shared
    *     boilerplate is not resemblance); every other pair's score
    *     shifts only by the flooded chunks' removal from its set
    *     sizes. The cap is applied by joining the chunk table to its
    *     own per-key counts (map-side-combined groupBy) — no broadcast
    *     of the over-cap key set, so the guard itself has no size
    *     assumption: both the counts join and the pair join key on the
    *     chunk value and reuse one exchange.
    *
    * Payload bytes never shuffle: the sha-256 group key, ids and chunk
    * keys are the only columns that cross an exchange (the chunkers
    * derive chunk rows in the scan stage). Eligibility for the exact-
    * dup score (1.0) requires a non-empty SURVIVING chunk set — the
    * same rule the join applies to distinct payloads. */
  private[graft] def collapsedChunkSetPairs(
      payloads: DataFrame,
      chunksOf: DataFrame => DataFrame,
      threshold: Double, maxDf: Long,
      scoreOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      scoreName: String): DataFrame = {
    val s = payloads.sparkSession
    import s.implicits._
    val keyed = payloads.select($"doc_id", $"payload",
      sha2($"payload", 256).as("sha"))
    // ids + group hash only — payload bytes stay in their scan stage
    val memberMap = keyed.select($"doc_id", $"sha")
    // one chunk set per DISTINCT payload (the collapse): identical
    // payloads' chunk rows merge in the distinct's partial aggregate,
    // so a mass-duplicated payload's flood never reaches the shuffle
    val chunks0 = chunksOf(keyed.select($"sha", $"payload")).distinct()
    val chunks =
      if (maxDf <= 0L) chunks0
      else {
        // df per chunk value over DISTINCT payloads (map-side combined);
        // applied as an inner join + filter rather than a broadcast
        // anti-join of over-cap keys: the over-cap set is unbounded on
        // an adversarial corpus (up to chunkRows/maxDf keys), while the
        // counts join keys on the same column as the pair join below
        // and costs no extra exchange on the probe side
        val df = chunks0.groupBy($"ck").agg(count(lit(1)).as("df"))
        chunks0.join(df, Seq("ck")).filter($"df" <= maxDf)
          .select($"sha", $"ck")
      }
    val n = chunks.groupBy($"sha").agg(count(lit(1)).as("n"))
    val inter = chunks.as("a").join(chunks.as("b"),
        $"a.ck" === $"b.ck" && $"a.sha" < $"b.sha")
      .groupBy($"a.sha".as("s1"), $"b.sha".as("s2"))
      .agg(count(lit(1)).as("i"))
    val repPairs = inter
      .join(n.select($"sha".as("s1"), $"n".as("n1")), "s1")
      .join(n.select($"sha".as("s2"), $"n".as("n2")), "s2")
      .select($"s1", $"s2",
        scoreOf($"i".cast("double") / ($"n1" + $"n2" - $"i")).as(scoreName))
      .filter(col(scoreName) >= threshold)
    // expand rep pairs back to member pairs (output mass = the true
    // answer's own size; no intermediate is larger than the answer)
    val crossPairs = repPairs
      .join(memberMap.select($"sha".as("s1"), $"doc_id".as("m1")), "s1")
      .join(memberMap.select($"sha".as("s2"), $"doc_id".as("m2")), "s2")
      .select(least($"m1", $"m2").as("d1"), greatest($"m1", $"m2").as("d2"),
        col(scoreName))
    // within-group pairs: identical payloads score exactly 1.0 — but
    // only when the group's SURVIVING chunk set is non-empty (empty
    // payloads and all-flooded chunk sets have no Jaccard, the same
    // rule the join applies between distinct payloads)
    val unitPairs = memberMap
      .join(n.select($"sha"), Seq("sha"), "left_semi").as("x")
      .join(memberMap.as("y"),
        $"x.sha" === $"y.sha" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("d1"), $"y.doc_id".as("d2"),
        scoreOf(lit(1.0)).as(scoreName))
      .filter(col(scoreName) >= threshold)
    crossPairs.unionByName(unitPairs)
  }

  /** The full contract including the df-cap: blocks in more than 64
    * DISTINCT payloads leave the Jaccard universe (numerator and
    * denominators) — boilerplate carries no resemblance signal. On the
    * fixtures the cap never fires (max honest df is 14 at sf0.1), so
    * this oracle is also exactly the uncapped Jaccard there. */
  val m06Sql: String =
    """WITH h AS (
      |  SELECT doc_id, upper(hex(encode(text))) AS hx FROM documents
      |  WHERE len(text) > 0
      |), ch AS (
      |  SELECT doc_id, hx, list_distinct([substr(hx, 1 + 128*i, 128)
      |           for i in range(0, CAST(ceil(len(hx) / 128.0) AS BIGINT))]) AS blks
      |  FROM h
      |), ex0 AS (
      |  SELECT doc_id, hx, unnest(blks) AS blk FROM ch
      |), ex AS (
      |  SELECT doc_id, blk FROM ex0
      |  WHERE blk NOT IN (SELECT blk FROM ex0 GROUP BY blk
      |                    HAVING COUNT(DISTINCT hx) > 64)
      |), n AS (
      |  SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY 1
      |), inter AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
      |  FROM ex a JOIN ex b ON a.blk = b.blk AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT d1, d2, CAST(i AS DOUBLE) / (n1.n + n2.n - i) AS block_jaccard
      |FROM inter
      |JOIN n n1 ON n1.doc_id = d1 JOIN n n2 ON n2.doc_id = d2
      |WHERE CAST(i AS DOUBLE) / (n1.n + n2.n - i) >= 0.5""".stripMargin

  /** m07: PERCEPTUAL near-dup for binary payloads — completes the
    * multimodal dedup tiering: m05 byte-exact → m06 block-set (catches
    * appended/truncated variants, breaks on any re-encode) → m07
    * perceptual (a re-encode preserves what the asset LOOKS like, and
    * a perceptual hash fingerprints that). The fingerprint is
    * [[graft.functions.BlockHash64]], a blockhash-style 64-bit hash of
    * the stub-decoded payload (64 segment means thresholded at their
    * median — integer-exact, no transcendentals, golden-hashable);
    * pairing is d05's 8×8-bit pigeonhole banding (hamming ≤ 7 ⇒ some
    * byte-chunk equal ⇒ guaranteed candidate coverage at the ≤ 6
    * filter) with the exact hamming verify on candidates.
    *
    * Scale shape = d05: one per-row codegen'd hash (no shuffle), 8
    * banding rows per payload, candidates from an equi-join on
    * (chunk_id, chunk_val), exact verify on candidates only. Payload
    * bytes never shuffle — only the 64-bit fingerprint and id do. */
  def m07PerceptualNearDup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    perceptualNearDupPairs(
      documents(s, d).select($"doc_id", encode($"text", "utf-8").as("payload")), 7)
  }

  /** The banded perceptual-hash join over any (doc_id, payload: binary)
    * frame — see [[m07PerceptualNearDup]]. `maxHamming` must be ≤ 7
    * for the pigeonhole coverage guarantee to hold. */
  def perceptualNearDupPairs(payloads: DataFrame, maxHamming: Int): DataFrame = {
    val s = payloads.sparkSession
    import s.implicits._
    require(maxHamming <= 7, "8-chunk pigeonhole guarantees coverage only to hamming 7")
    val fp = payloads.select($"doc_id",
      graft.functions.VectorOps.blockhash64($"payload").as("fp"))
    val chunks = array((0 until 8).map(c =>
      shiftright($"fp", c * 8).bitwiseAND(lit(255L))): _*)
    val chunked = fp.select($"doc_id", $"fp", posexplode(chunks))
      .toDF("doc_id", "fp", "chunk_id", "chunk_val")
    chunked.as("x").join(chunked.as("y"),
        $"x.chunk_id" === $"y.chunk_id" && $"x.chunk_val" === $"y.chunk_val" &&
        $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("d1"), $"y.doc_id".as("d2"),
        Dedup.hamming($"x.fp", $"y.fp").as("hamming"))
      .distinct()
      .filter($"hamming" <= maxHamming)
  }

  // ---- m08: incremental payload admission (delta vs standing manifest) ----

  /** m08: the multimodal leg of the incremental family (text d11,
    * embeddings s06, curation c12, profile t28): a newly-ingested
    * payload batch is admitted against the STANDING corpus's
    * content-hash manifest — the ~50 B/payload artifact the m05 pass
    * already produces and c07 diffs — so re-crawled bytes are dropped
    * before any decode/feature work runs. One broadcastable anti-join
    * on sha-256; the payload BYTES of the standing corpus are never
    * read (the manifest is the only standing input), which is the
    * entire economics at 100 TB of media.
    *
    * Split mirrors d11 (doc_id ≡ 0 mod 10 plays the delta); within the
    * delta, keep-first by doc_id (a batch can re-carry its own dups).
    * Output: admitted (doc_id, payload_sha256) — full SQL oracle. */
  def m08DeltaPayloads(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val all = documents(s, d)
      .select($"doc_id", sha2(encode($"text", "utf-8"), 256).as("payload_sha256"))
    val standing = all.filter($"doc_id" % 10 =!= 0)
    val delta = all.filter($"doc_id" % 10 === 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"payload_sha256").orderBy($"doc_id")
    delta
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .join(standing.select($"payload_sha256"), Seq("payload_sha256"), "left_anti")
      .select($"doc_id", $"payload_sha256")
  }

  val m08Sql: String =
    """WITH h AS (
      |  SELECT doc_id, sha256(text) AS payload_sha256 FROM documents
      |), first_delta AS (
      |  SELECT payload_sha256, MIN(doc_id) AS doc_id
      |  FROM h WHERE doc_id % 10 = 0 GROUP BY 1
      |)
      |SELECT doc_id, payload_sha256 FROM first_delta
      |WHERE payload_sha256 NOT IN (
      |  SELECT payload_sha256 FROM h WHERE doc_id % 10 <> 0)""".stripMargin

  // ---- m09: payload benchmark decontamination (exact + perceptual) ----

  /** m09: the multimodal leg of benchmark decontamination, completing
    * the triad across modalities: d07/d16 flag n-gram overlap (text),
    * s19 flags embedding proximity (semantics), m09 flags PAYLOADS —
    * both the byte-exact copy (sha-256 membership in the benchmark
    * manifest) and the re-encoded/stamped/prefixed variant (perceptual
    * fingerprint within hamming ≤ 7, m07's tier). An eval asset pasted
    * into a training crawl rarely arrives byte-identical — it gets
    * recompressed, watermarked, prefixed; the perceptual tier is the
    * one that catches those, and the byte tier labels which hits are
    * provably the same file.
    *
    * Scale (100 TB): the benchmark side is small by construction (the
    * d07/d16/s19 premise), so its fingerprint bands and sha manifest
    * BROADCAST — the corpus side computes one codegen'd BlockHash64
    * per payload (no shuffle of payload bytes, ever), candidates arise
    * from d05's 8×8 pigeonhole banding against bench bands only
    * (asymmetric corpus × bench, never corpus²; coverage to hamming 7
    * guaranteed), exact hamming verifies candidates, and the per-doc
    * argmin (hamming, bench_id) is a window over the few candidate
    * rows. byte_exact is an independent broadcast join on sha-256
    * (two payloads can share a fingerprint without sharing bytes).
    * Output: the FULL per-doc audit (the s19 framing — nearest bench
    * evidence where one exists within the radius, nulls + a false flag
    * otherwise), so the oracle hashes every decision, not just the
    * flagged tail. Deterministic mechanism over engine-side hashes →
    * golden-hashed (the m07/d05 discipline); planted
    * exact/perturbed/unrelated spec. */
  def m09BenchDecontamination(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val all = documents(s, d)
      .select($"doc_id", encode($"text", "utf-8").as("payload"))
    payloadDecontamination(all.filter($"doc_id" >= 20),
      all.filter($"doc_id" < 20), maxHamming = 7)
  }

  /** Frame-taking core of m09: corpus and benchmark as
    * (doc_id, payload: binary) frames. */
  def payloadDecontamination(corpus: DataFrame, bench: DataFrame,
                             maxHamming: Int): DataFrame = {
    val s = corpus.sparkSession
    import s.implicits._
    require(maxHamming <= 7, "8-chunk pigeonhole guarantees coverage only to hamming 7")
    def fp(df: DataFrame) = df.select($"doc_id",
      graft.functions.VectorOps.blockhash64($"payload").as("fp"),
      sha2($"payload", 256).as("sha"))
    def bands(df: DataFrame) = {
      val chunks = array((0 until 8).map(c =>
        shiftright($"fp", c * 8).bitwiseAND(lit(255L))): _*)
      df.select($"doc_id", $"fp", posexplode(chunks))
        .toDF("doc_id", "fp", "chunk_id", "chunk_val")
    }
    val b = fp(bench)
    val c = fp(corpus)
    val cand = bands(c).as("x")
      .join(broadcast(bands(b.select($"doc_id".as("doc_id"), $"fp")).as("y")),
        $"x.chunk_id" === $"y.chunk_id" && $"x.chunk_val" === $"y.chunk_val")
      .select($"x.doc_id".as("doc_id"), $"y.doc_id".as("bench_id"),
        Dedup.hamming($"x.fp", $"y.fp").as("hamming"))
      .distinct()
      .filter($"hamming" <= maxHamming)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"hamming".asc, $"bench_id".asc)
    val flagged = cand
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
      .join(c.select($"doc_id", $"sha"), Seq("doc_id"))
      .join(broadcast(b.select($"sha").distinct()
        .withColumn("byte_hit", lit(true))), Seq("sha"), "left")
      .select($"doc_id", $"bench_id", $"hamming",
        coalesce($"byte_hit", lit(false)).as("byte_exact"))
    c.select($"doc_id").join(flagged, Seq("doc_id"), "left")
      .select($"doc_id", $"bench_id", $"hamming",
        coalesce($"byte_exact", lit(false)).as("byte_exact"),
        $"bench_id".isNotNull.as("contaminated"))
  }

  // ---- m10: persisted perceptual band index (probe deltas at fp cost) ----

  /** m10: the perceptual fingerprint index as a PERSISTED ARTIFACT —
    * the multimodal twin of d21's text LSH index and s17/s18's
    * inverted file, completing the index-artifact family across all
    * three modalities (text shingles, embeddings, payloads). m08
    * admits deltas against the byte-exact sha manifest, but a
    * re-encoded/watermarked variant sails through it and is only
    * caught by a full m07 pass — which recomputes every standing
    * fingerprint from standing payload BYTES. The production shape
    * writes the band table ONCE: (doc_id, fp, chunk_id, chunk_val),
    * 8 rows × ~28 B per payload — a few hundred bytes standing in for
    * the megabytes of the payload itself. Each delta batch computes
    * its own fingerprints in-plan (one codegen'd BlockHash64 per
    * payload, no shuffle of payload bytes), equi-joins its band keys
    * against the standing table, and hamming-verifies only the
    * collided candidates; standing payload bytes are never read again
    * — the entire economics of 100 TB of media.
    * [[appendToPayloadIndex]] admits batches into the artifact (new
    * files only; standing files byte-untouched — the s18/d21 append
    * discipline), so consecutive deltas also probe each other.
    *
    * Probe ≡ m07 over (standing ∪ delta) restricted to delta-touching
    * pairs: candidates are delta-side × union-side within shared
    * (chunk_id, chunk_val) buckets, so old–old pairs never form, and
    * the 8×8-bit pigeonhole banding guarantees coverage to hamming ≤ 7
    * — the restriction is EXACT, not a recall bound (stronger than
    * d21's < 1e-12 equivalence). Registered entry rebuilds the
    * standing frames in-plan (oracle self-containment, the d19/d21
    * discipline); the persisted round-trip is spec-pinned. */
  def writePayloadIndex(payloads: DataFrame, dir: String): Unit = {
    val g = IndexStore.nextGen(dir)
    payloadBands(payloads).write.mode("overwrite")
      .parquet(s"${IndexStore.genPath(dir, g)}/bands")
    IndexStore.publish(dir, g)
    IndexStore.sweep(dir)
  }

  /** Admit a delta batch into a standing index: append-only — new
    * files land beside the standing ones, which stay byte-untouched.
    * `compactEvery` > 0 auto-folds every that-many appends (the
    * appendToLshIndex knob; `_appends` counter, single-writer). */
  def appendToPayloadIndex(delta: DataFrame, dir: String,
                           compactEvery: Int = 0): Unit = {
    payloadBands(delta).write.mode("append")
      .parquet(s"${IndexStore.currentPath(dir)}/bands")
    if (compactEvery > 0 && IndexStore.bumpAppends(dir) % compactEvery == 0)
      compactPayloadIndex(delta.sparkSession, dir)
  }

  /** Compact a standing payload index: fold the band lane's append
    * files into few large ones — a row-preserving rewrite, so probe
    * answers are identical. Live-reader-safe via [[IndexStore]]
    * generations (atomic flip, one-cycle sweep grace) — the d21/s17
    * compaction contract on the payload modality. */
  def compactPayloadIndex(s: SparkSession, dir: String): Unit = {
    IndexStore.adoptLegacy(dir) // flat pre-generation dirs migrate once
    val src = IndexStore.currentPath(dir)
    val g = IndexStore.nextGen(dir)
    val in = s.read.parquet(s"$src/bands")
    // tombstones fold in: dead payloads' band rows anti-joined out and
    // the new generation carries no tombstone lane — reclaim = the flip
    // (identity when no deletion was ever recorded — the r17 fast path)
    IndexStore.maskTombstonesAt(in, src, "doc_id")
      .coalesce(math.max(1, in.inputFiles.length / 16))
      .write.mode("overwrite").parquet(s"${IndexStore.genPath(dir, g)}/bands")
    IndexStore.publish(dir, g)
    IndexStore.sweep(dir)
  }

  /** Record deletions against a standing payload index (takedowns are
    * MOST common on the media tier): doc ids append as tombstones
    * under the current generation; probes mask them with one broadcast
    * anti-join (removals are delta-sized), so delete → probe ≡ probe
    * of an index rebuilt without the removed payloads — hash-checked
    * by the registered m18 entry and spec-pinned. Double-deletes and
    * absent ids are no-ops; [[compactPayloadIndex]] physically drops
    * dead band rows; `compactEvery` counts deletes toward the same
    * auto-compaction cadence as appends. */
  def deleteFromPayloadIndex(removedIds: DataFrame, dir: String,
                             compactEvery: Int = 0): Unit = {
    IndexStore.appendTombstones(removedIds, dir, "doc_id")
    if (compactEvery > 0 && IndexStore.bumpAppends(dir) % compactEvery == 0)
      compactPayloadIndex(removedIds.sparkSession, dir)
  }

  /** UPDATE changed payloads in a standing index — the third lifecycle
    * verb (r17), for c07's `changed` set on the media tier (a
    * re-encoded image, a re-mastered audio file: same doc identity,
    * new bytes, new fingerprint). One generation fold (the
    * [[graft.operators.Dedup.updateInLshIndex]] discipline): gen N+1 =
    * standing band rows minus (tombstoned ∪ changed) ids plus the
    * revisions' freshly-derived bands, one atomic publish; probe ≡
    * rebuild-with-new-revisions, IndexUpdateSpec-pinned. Payload
    * bytes never shuffle — only the 8 band rows per doc move. */
  def updateInPayloadIndex(changed: DataFrame, dir: String): Unit =
    syncPayloadIndex(changed, changed.sparkSession.range(0)
      .select(org.apache.spark.sql.functions.col("id").as("doc_id")), dir)

  /** Apply a FULL c07 snapshot diff in ONE atomic generation — the
    * composed lifecycle verb on the payload artifact
    * ([[graft.operators.Dedup.syncLshIndex]]'s contract, incl. its r18
    * malformed-batch resolution: delete-wins on an id in both sets,
    * one deterministic revision per id via
    * [[IndexStore.latestRevision]]). */
  def syncPayloadIndex(upserts0: DataFrame, removed: DataFrame,
                       dir: String): Unit = {
    val s = upserts0.sparkSession
    import s.implicits._
    IndexStore.adoptLegacy(dir)
    val src = IndexStore.currentPath(dir)
    val g = IndexStore.nextGen(dir)
    val in = s.read.parquet(s"$src/bands")
    val upserts = IndexStore.latestRevision(upserts0, "doc_id")
      .join(org.apache.spark.sql.functions.broadcast(
        removed.select($"doc_id")), Seq("doc_id"), "left_anti")
    val dead = IndexStore.readTombstones(s, dir, "doc_id")
      .unionByName(removed.select($"doc_id"))
      .unionByName(upserts.select($"doc_id")).distinct().localCheckpoint()
    in.join(org.apache.spark.sql.functions.broadcast(dead),
        Seq("doc_id"), "left_anti")
      .coalesce(math.max(1, in.inputFiles.length / 16))
      .unionByName(payloadBands(upserts))
      .write.mode("overwrite").parquet(s"${IndexStore.genPath(dir, g)}/bands")
    IndexStore.publish(dir, g)
    IndexStore.sweep(dir)
    graft.Scratch.releaseNow(dead)
  }

  /** The banded-fingerprint frame of a (doc_id, payload) batch — the
    * index's row format and the probe's in-plan delta lane (the same
    * codegen'd BlockHash64 + 8×8-bit chunking m07 runs in-plan). */
  private def payloadBands(payloads: DataFrame): DataFrame = {
    val s = payloads.sparkSession
    import s.implicits._
    val chunks = array((0 until 8).map(c =>
      shiftright($"fp", c * 8).bitwiseAND(lit(255L))): _*)
    payloads
      .select($"doc_id",
        graft.functions.VectorOps.blockhash64($"payload").as("fp"))
      .select($"doc_id", $"fp", posexplode(chunks))
      .toDF("doc_id", "fp", "chunk_id", "chunk_val")
  }

  /** Probe a delta batch against a persisted index: the hamming ≤ h
    * pairs touching the delta (new–old and new–new), at delta
    * fingerprint cost + one band-keyed equi-join. */
  def probePayloadIndex(s: SparkSession, dir: String, delta: DataFrame,
                        maxHamming: Int): DataFrame = {
    // generation resolved ONCE; bands + tombstones read through it
    val root = IndexStore.currentPath(dir)
    probePayloadBands(
      // tombstone masking ([[deleteFromPayloadIndex]]) — plan-identical
      // to the pre-deletion probe on a never-deleted index
      IndexStore.maskTombstonesAt(
        s.read.parquet(s"$root/bands"), root, "doc_id"),
      delta, maxHamming)
  }

  /** Frame-taking core of the probe (the registered entry builds the
    * standing band frame in-plan to stay oracle-self-contained). */
  private[graft] def probePayloadBands(standing: DataFrame,
      delta: DataFrame, maxHamming: Int): DataFrame = {
    val s = delta.sparkSession
    import s.implicits._
    require(maxHamming <= 7, "8-chunk pigeonhole guarantees coverage only to hamming 7")
    val dBands = payloadBands(delta)
    val all = standing.unionByName(dBands)
    dBands.as("x").join(all.as("y"),
        $"x.chunk_id" === $"y.chunk_id" && $"x.chunk_val" === $"y.chunk_val" &&
        $"x.doc_id" =!= $"y.doc_id")
      .select(least($"x.doc_id", $"y.doc_id").as("d1"),
              greatest($"x.doc_id", $"y.doc_id").as("d2"),
              graft.operators.Dedup.hamming($"x.fp", $"y.fp").as("hamming"))
      .distinct()
      .filter($"hamming" <= maxHamming)
  }

  /** Registered split: doc_id ≡ 0 mod 10 plays the delta (the
    * d11/d21/m08 convention); standing bands built in-plan. */
  def m10PayloadIndexProbe(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val all = documents(s, d)
      .select($"doc_id", encode($"text", "utf-8").as("payload"))
    probePayloadBands(payloadBands(all.filter($"doc_id" % 10 =!= 0)),
      all.filter($"doc_id" % 10 === 0), 7)
  }

  /** m18: m10's probe AFTER DELETIONS — standing payloads with
    * doc_id ≡ 0 (mod 7) tombstoned ([[deleteFromPayloadIndex]]), then
    * the delta probes the masked index: no pair may touch a removed
    * payload, exactly what an index rebuilt without them answers.
    * Masking is the same one broadcast anti-join the artifact probe
    * applies (standing bands stream past the delta-sized removal set,
    * preserving m10's never-reread-payload-bytes economics).
    * Deterministic like m10 (blockhash fingerprints, integer hamming)
    * → its own golden; the persisted round-trip (delete → probe ≡
    * rebuild, idempotence, compaction reclaim) is spec-pinned in
    * IndexDeletionSpec. Standing bands built in-plan (oracle
    * self-containment, the m10 discipline). */
  def m18PayloadDeleteProbe(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val all = documents(s, d)
      .select($"doc_id", encode($"text", "utf-8").as("payload"))
    val removed = all
      .filter($"doc_id" % 10 =!= 0 && $"doc_id" % 7 === 0)
      .select($"doc_id")
    probePayloadBands(
      payloadBands(all.filter($"doc_id" % 10 =!= 0))
        .join(broadcast(removed), Seq("doc_id"), "left_anti"),
      all.filter($"doc_id" % 10 === 0), 7)
  }

  // ---- m11: perceptual dup clusters + keep-one manifest ----

  /** m11: the media tier's d17 — perceptual near-dup CLUSTERS with a
    * keep-one manifest, completing the payload dedup ladder
    * (m05 exact → m06 block → m07 perceptual → m11 clusters). m07
    * emits pairs; a curation run needs the transitive groups and one
    * kept representative per group (re-encodes, crops and stamps of
    * one asset chain through hamming ≤ 7 links even when the ends
    * differ by more). Output: (doc_id, cluster_rep) for every payload
    * in any perceptual pair, rep = min doc_id (doc_id = cluster_rep
    * marks the keeper) — d08's contract over m07's edge set, via the
    * same CC machinery.
    *
    * Scale: m07's banded candidate join never rereads payload bytes
    * beyond the fingerprint pass, and CC runs on the sparse verified
    * pair graph (doubling rounds, bounded storage — the d08 analysis).
    * Fingerprints are engine-side → golden-snapshot oracle, with the
    * CC layer's determinism already carried by the d08 machinery. */
  def m11PerceptualClusters(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Dedup.clusterPairs(m07PerceptualNearDup(s, d).select($"d1", $"d2"))
  }


  // ---- m12: content-defined chunk dedup (CDC / Gear rolling hash) ----

  /** m12: near-dup payloads by CONTENT-DEFINED chunking — the
    * insertion-robust member of the binary dedup ladder. m06's fixed
    * 64-byte grid breaks on insertion (one prepended stamp byte shifts
    * every later block boundary → shared blocks ≈ 0) and m07's
    * perceptual fingerprint absorbs it only by summarizing the whole
    * payload; CDC places boundaries where the rolling hash of the
    * content hits a mask (Gear/FastCDC), so an edit perturbs only the
    * chunks it touches and every later boundary RE-SYNCHRONIZES —
    * appended, prepended, and mid-edited variants keep sharing the
    * untouched chunks. Pairs are scored by exact Jaccard over distinct
    * chunk-hash sets (m06's join machinery over [[graft.functions
    * .GearChunkHashes]]'s chunks: a 6-bit mask spread over
    * h's bits 10..20 — mixing ~2–20 trailing bytes per bit — for a
    * ~64 B average, min 16, max 256).
    *
    * Scale: chunking is one codegen'd pass over payload bytes; the
    * candidate join is an inverted-index equi-join on the 64-bit chunk
    * hash (never payload bytes), intersection counts group by the pair
    * — all linear in chunk mass, under [[collapsedChunkSetPairs]]'s
    * two storm guards (byte-exact collapse + chunk df-cap). Chunk
    * hashes are engine-side → golden-snapshot oracle; the kernel is a
    * sequential pure function per row, parallelism-independent. */
  /** 6 bits spread over 10..20: P(boundary) = 1/64 per byte with each
    * mask bit drawing on a different depth of trailing-byte history. */
  private[graft] val GearMask: Long =
    (1L << 10) | (1L << 12) | (1L << 14) | (1L << 16) | (1L << 18) | (1L << 20)

  def cdcChunkHashes(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.GearChunkHashes(payload, GearMask, 16, 256)

  def cdcNearDupPairs(payloads: DataFrame, threshold: Double,
                      maxDf: Long = PayloadChunkMaxDf): DataFrame = {
    val s = payloads.sparkSession
    import s.implicits._
    collapsedChunkSetPairs(payloads,
      keyed => keyed.select($"sha", explode(cdcChunkHashes($"payload")).as("ck")),
      threshold, maxDf, round(_, 6), "cdc_jaccard")
  }

  def m12CdcNearDup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    cdcNearDupPairs(
      documents(s, d).select($"doc_id", encode($"text", "utf-8").as("payload")), 0.5)
  }

  // ---- m13: chunk-level storage dedup report ----

  /** m13: the STORAGE-PLANNING face of payload dedup — per source, how
    * many bytes does chunk-level deduplication actually save? Every
    * dedup store (content-addressed object stores, backup systems à la
    * LBFS/restic, training-data blob caches) reports exactly this
    * table before anyone provisions capacity: payload mass, chunk
    * mass after within-source dedup, and the ratio. m05 answers
    * "how many whole files are copies"; m06/m12 answer "which PAIRS
    * are near-dups"; m13 prices the byte savings of storing each
    * distinct chunk once — the number that decides whether a
    * dedup store is worth running at all.
    *
    * Chunks are m06's fixed 64-byte grid (byte-exact, engine-neutral →
    * full SQL oracle; [[m14CdcStorageDedup]] is the content-defined
    * lane). Rows are per source PLUS one corpus-total row
    * (source = '*'): chunks shared ACROSS sources — mirrored docs,
    * cross-source boilerplate — dedupe only at corpus scope, so the
    * '*' row is where a multi-source store's real savings show (the
    * fixture's dup docs straddle sources; per-source rows sit ≈ 1).
    *
    * Scale: one narrow pass cuts payloads into (source, blk) rows; the
    * distinct and both aggregates are map-side combined and keyed by
    * source(+chunk value) — content-hash-uniform, no skewable key, no
    * join wider than the final per-source rollup. Payload bytes never
    * shuffle (hex blocks + source only). */
  def m13StorageDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val h = documents(s, d)
      .select($"source", hex(encode($"text", "utf-8")).as("hx"))
      .filter(length($"hx") > 0)
    val nch = ceil(length($"hx") / lit(128.0)).cast("long")
    val blocks = h
      .select($"source", $"hx", explode(sequence(lit(0L), nch - 1)).as("i"))
      .select($"source",
        expr("substring(hx, cast(i * 128 + 1 as int), 128)").as("blk"))
    storageReport(
      h.select($"source", (length($"hx") / 2).cast("long").as("n_bytes")),
      blocks.select($"source", $"blk".as("ck"),
        (length($"blk") / 2).cast("long").as("len")),
      "n_distinct_blocks", "dedup_ratio_r")
  }

  /** The per-source + corpus-total ('*') rollup both storage reports
    * share. The corpus row is NOT the sum of the per-source rows —
    * chunks shared ACROSS sources (mirrored docs, cross-source
    * boilerplate) dedupe only there, which is where most of the
    * fixture's savings live. Corpus-wide distinctness is one extra
    * distinct + rollup over the same chunk rows.
    *
    * Integer bounds (the c20/t36 audit): every sum here is LINEAR in
    * payload mass — total_bytes / unique_bytes are Σ of per-payload
    * byte counts, never products — so BIGINT is exact to ~9.2 EB
    * (2^63 bytes), five orders past the 100 TB design point. No
    * decimal lane needed. */
  private def storageReport(payloadBytes: DataFrame, chunks: DataFrame,
                            nDistinctCol: String, ratioCol: String): DataFrame = {
    val s = payloadBytes.sparkSession
    import s.implicits._
    def report(tot: DataFrame, uq: DataFrame): DataFrame =
      tot.join(uq, Seq("source"))
        .select($"source", $"n_payloads", $"total_bytes",
          col(nDistinctCol), $"unique_bytes",
          round($"total_bytes".cast("double") / $"unique_bytes", 6)
            .as(ratioCol))
    val perSource = report(
      payloadBytes.groupBy($"source").agg(
        count(lit(1)).as("n_payloads"), sum($"n_bytes").as("total_bytes")),
      chunks.distinct().groupBy($"source").agg(
        count(lit(1)).as(nDistinctCol), sum($"len").as("unique_bytes")))
    val corpus = report(
      payloadBytes.groupBy(lit("*").as("source")).agg(
        count(lit(1)).as("n_payloads"), sum($"n_bytes").as("total_bytes")),
      chunks.select($"ck", $"len").distinct()
        .groupBy(lit("*").as("source")).agg(
          count(lit(1)).as(nDistinctCol), sum($"len").as("unique_bytes")))
    perSource.unionByName(corpus)
  }

  val m13Sql: String =
    """WITH h AS (
      |  SELECT source, upper(hex(encode(text))) AS hx FROM documents
      |  WHERE len(text) > 0
      |), ex AS (
      |  SELECT source, unnest([substr(hx, 1 + 128*i, 128)
      |           for i in range(0, CAST(ceil(len(hx) / 128.0) AS BIGINT))]) AS blk
      |  FROM h
      |), ps AS (
      |  SELECT source, COUNT(*) AS n_payloads,
      |    CAST(SUM(len(hx) / 2) AS BIGINT) AS total_bytes
      |  FROM h GROUP BY 1
      |), pu AS (
      |  SELECT source, COUNT(*) AS n_distinct_blocks,
      |    CAST(SUM(len(blk) / 2) AS BIGINT) AS unique_bytes
      |  FROM (SELECT DISTINCT source, blk FROM ex) GROUP BY 1
      |), cs AS (
      |  SELECT '*' AS source, COUNT(*) AS n_payloads,
      |    CAST(SUM(len(hx) / 2) AS BIGINT) AS total_bytes FROM h
      |), cu AS (
      |  SELECT '*' AS source, COUNT(*) AS n_distinct_blocks,
      |    CAST(SUM(len(blk) / 2) AS BIGINT) AS unique_bytes
      |  FROM (SELECT DISTINCT blk FROM ex)
      |)
      |SELECT source, n_payloads, total_bytes, n_distinct_blocks, unique_bytes,
      |  ROUND(CAST(total_bytes AS DOUBLE) / unique_bytes, 6) AS dedup_ratio_r
      |FROM (SELECT ps.*, n_distinct_blocks, unique_bytes
      |      FROM ps JOIN pu USING (source)
      |      UNION ALL
      |      SELECT cs.*, n_distinct_blocks, unique_bytes
      |      FROM cs JOIN cu USING (source))""".stripMargin

  /** m14: m13's CONTENT-DEFINED lane — the same per-source storage
    * dedup report over Gear-CDC chunks instead of the fixed 64-byte
    * grid. The number capacity planning actually uses: real dedup
    * stores (LBFS/restic/borg, blob caches) chunk content-defined
    * precisely because insert-shifted near-copies then share all
    * untouched chunks — m13's grid misses those, so its ratio is the
    * conservative floor and m14's the operating estimate; the gap
    * between the two rows is the measured value of CDC itself.
    *
    * Scale: one codegen'd byte pass per payload ([[graft.functions
    * .GearChunkSpans]] — same cut points as m12's hashes, plus byte
    * lengths), then m13's shape exactly: map-side-combined distinct +
    * two per-source rollups, only (source, hash, len) rows shuffle.
    * Engine-side chunker → golden-snapshot oracle (the m12
    * discipline; the kernel is a sequential pure function per row). */
  def m14CdcStorageDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p = documents(s, d)
      .select($"source", encode($"text", "utf-8").as("payload"))
      .filter(length($"payload") > 0)
    val sp = p.select($"source", length($"payload").cast("long").as("n_bytes"),
      graft.functions.GearChunkSpans($"payload", GearMask, 16, 256).as("sp"))
    storageReport(
      sp.select($"source", $"n_bytes"),
      sp.select($"source", explode(arrays_zip($"sp.h", $"sp.len")).as("z"))
        .select($"source", $"z.h".as("ck"), $"z.len".cast("long").as("len")),
      "n_distinct_chunks", "cdc_dedup_ratio_r")
  }

  // ---- m17: snapshot transfer estimate (CDC delta bytes) ----

  /** m17: how many bytes must a content-addressed store actually
    * INGEST for the new corpus snapshot, given the old one — the
    * rsync/restic provisioning number, and the operating cost of the
    * c07 → m08 → re-embed incremental loop in BYTE terms. Snapshots
    * follow c07's convention (old = doc_id % 10 ≠ 0 with the % 10 = 5
    * docs on a stale revision; new = doc_id % 10 ≠ 1 on current text),
    * so the delta contains added docs, removed docs, and EDITED docs —
    * where content-defined chunking earns its keep: an edit re-syncs
    * at the next Gear cut point, so only the touched chunks are novel,
    * while m13's fixed grid would shift-invalidate everything after
    * the edit. Per source + the '*' corpus row: new-snapshot byte
    * mass, its distinct-chunk mass (within-snapshot dedup), the NOVEL
    * chunk mass (distinct new chunks absent from the old snapshot's
    * global chunk set — the transfer), and the two ratios that price
    * it (novel/distinct and total savings vs shipping every byte).
    *
    * Scale: two narrow chunking passes (old side reduces to a distinct
    * hash SET — ~8 B/chunk, no lengths, no payload bytes move), one
    * hash-keyed anti-join of new distinct chunks against that set, and
    * |sources|-key rollups. The '*' row dedups chunks globally (the
    * m13 cross-source rule); per-source rows dedup within source.
    * Gear spans are engine-side (the m12/m14 argument) → golden
    * oracle. */
  def m17SnapshotTransfer(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d)
    val oldSpans = docs.filter($"doc_id" % 10 =!= 0)
      .select(encode(
        when($"doc_id" % 10 === 5, concat($"text", lit(" [stale rev]")))
          .otherwise($"text"), "utf-8").as("payload"))
      .filter(length($"payload") > 0)
      .select(graft.functions.GearChunkSpans($"payload", GearMask, 16, 256).as("sp"))
    val oldSet = oldSpans.select(explode($"sp.h").as("ck")).distinct()
    val newSp = docs.filter($"doc_id" % 10 =!= 1)
      .select($"source", encode($"text", "utf-8").as("payload"))
      .filter(length($"payload") > 0)
      .select($"source", length($"payload").cast("long").as("n_bytes"),
        graft.functions.GearChunkSpans($"payload", GearMask, 16, 256).as("sp"))
    val newChunks = newSp
      .select($"source", explode(arrays_zip($"sp.h", $"sp.len")).as("z"))
      .select($"source", $"z.h".as("ck"), $"z.len".cast("long").as("len"))
    def report(bytes: DataFrame, uq: DataFrame): DataFrame = {
      val novel = uq.join(oldSet, Seq("ck"), "left_anti")
        .groupBy($"source")
        .agg(count(lit(1)).as("novel_chunks"), sum($"len").as("novel_bytes"))
      bytes.join(
          uq.groupBy($"source").agg(count(lit(1)).as("n_distinct_chunks"),
            sum($"len").as("distinct_bytes")), Seq("source"))
        .join(novel, Seq("source"), "left")
        .select($"source", $"new_bytes", $"n_distinct_chunks",
          $"distinct_bytes",
          coalesce($"novel_chunks", lit(0L)).as("novel_chunks"),
          coalesce($"novel_bytes", lit(0L)).as("novel_bytes"),
          round(coalesce($"novel_bytes", lit(0L)).cast("double") /
            $"distinct_bytes", 6).as("novel_ratio_r"),
          round(lit(1.0) - coalesce($"novel_bytes", lit(0L)).cast("double") /
            $"new_bytes", 6).as("transfer_savings_r"))
    }
    report(
      newSp.groupBy($"source").agg(sum($"n_bytes").as("new_bytes")),
      newChunks.distinct())
      .unionByName(report(
        newSp.groupBy(lit("*").as("source")).agg(sum($"n_bytes").as("new_bytes")),
        newChunks.select(lit("*").as("source"), $"ck", $"len").distinct()))
  }

  // ---- m15: payload byte-profile (binary/garbage admission signal) ----

  /** m15: per-payload byte-distribution profile — total bytes, distinct
    * byte values, top-byte share, printable-ASCII fraction. The cheap
    * FIRST filter of a multimodal ingest: mis-decoded text, truncated
    * containers, encrypted/compressed junk and zero-padded blobs all
    * separate from honest content on exactly these numbers (junk ≈
    * uniform bytes → distinct ~256 and printable ~0.37; padding →
    * top-byte share ~1; text → printable ~1), BEFORE any decode /
    * feature / perceptual stage spends compute. Deliberately integer
    * statistics, not byte entropy: entropy's logs are transcendental
    * (cross-engine unsafe — the t21/t25 lesson) and these four numbers
    * carry the same decision boundary.
    *
    * Scale: the profile is a pure per-row fold over a 256-cell byte
    * histogram, so it runs as ONE codegen'd expression pass
    * ([[graft.functions.BytePayloadProfile]]) — scan → project, zero
    * shuffle, zero explode (the explode-through-aggregate form hashes
    * the corpus's entire byte mass to compute 4 numbers per doc:
    * measured 3.4 s vs ~0.3 s at sf0.1, a non-starter at 100 TB).
    * The values are exactly what the per-byte SQL computes — integer
    * counts + 6dp ratios → full DuckDB oracle unchanged. */
  def m15PayloadByteProfile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    byteProfile(documents(s, d)
      .select($"doc_id", encode($"text", "utf-8").as("payload")))
  }

  /** The profile over any (doc_id, payload binary) frame — see
    * [[m15PayloadByteProfile]]. */
  def byteProfile(payloads: DataFrame): DataFrame = {
    val s = payloads.sparkSession
    import s.implicits._
    payloads
      .filter(length($"payload") > 0)
      .select($"doc_id",
        graft.functions.BytePayloadProfile($"payload").as("p"))
      .select($"doc_id",
        $"p.n_bytes".as("n_bytes"),
        $"p.n_distinct".as("n_distinct_bytes"),
        round($"p.top_c".cast("double") / $"p.n_bytes", 6)
          .as("top_byte_share_r"),
        round($"p.printable".cast("double") / $"p.n_bytes", 6)
          .as("printable_frac_r"))
  }

  val m15Sql: String =
    """WITH h AS (
      |  SELECT doc_id, upper(hex(encode(text))) AS hx FROM documents
      |  WHERE len(text) > 0
      |), bx AS (
      |  SELECT doc_id, unnest([substr(hx, 1 + 2*i, 2)
      |           for i in range(0, CAST(len(hx) / 2 AS BIGINT))]) AS b
      |  FROM h
      |), hist AS (
      |  SELECT doc_id, b, COUNT(*) AS c FROM bx GROUP BY 1, 2
      |)
      |SELECT doc_id,
      |  CAST(SUM(c) AS BIGINT) AS n_bytes,
      |  COUNT(*) AS n_distinct_bytes,
      |  ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_byte_share_r,
      |  ROUND(CAST(SUM(CASE WHEN b >= '20' AND b <= '7E' THEN c ELSE 0 END)
      |    AS DOUBLE) / SUM(c), 6) AS printable_frac_r
      |FROM hist GROUP BY doc_id""".stripMargin

  // ---- m16: container sniff & declared-modality mismatch audit ----

  /** m16: container-magic sniffing vs the DECLARED modality — the
    * mislabeled-asset gate every multimodal crawl needs: upstream
    * metadata lies (a .png that is a JPEG, an "image" that is RIFF
    * audio, HTML error pages served as media), and decode stages crash
    * or silently garbage on the lie. Sniffing reads NOTHING but the
    * first 8 payload bytes (PNG/JPEG/RIFF signatures — the standard
    * public magic numbers); the report is the (declared, sniffed)
    * confusion matrix with payload counts and byte mass, the artifact
    * that tells you which source's labels to distrust before routing
    * payloads to decoders.
    *
    * Fixture: the corpus has no real containers, so — the c22 canary
    * discipline — declared labels and actual container prefixes are
    * planted deterministically from doc_id, with doc_id % 17 rows
    * mislabeled (actual class rotated one step from the declared one),
    * so the matrix has exact expected off-diagonal mass and the sniff
    * arithmetic is oracle-checked for real. On a real corpus the same
    * sniff column runs against the stored payload and its metadata
    * column.
    *
    * Scale: payload construction + the 8-byte prefix sniff are per-row
    * codegen expressions (the sniff never hexes more than 8 bytes on
    * the Spark side); the only exchange is the ≤ |types|²-key rollup.
    * Byte mass sums are linear BIGINT. */
  def m16ModalitySniff(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val types  = typedLit(Seq("png", "jpeg", "riff", "raw"))
    val magics = typedLit(Seq("89504E470D0A1A0A", "FFD8FF", "52494646", ""))
    val declaredIdx = ($"doc_id" % 4).cast("int")
    val actualIdx = when($"doc_id" % 17 === 0,
      (($"doc_id" % 4) + 1) % 4).otherwise($"doc_id" % 4).cast("int")
    val payload = concat(unhex(element_at(magics, actualIdx + 1)),
      encode($"text", "utf-8"))
    val prefix = substring(upper(hex(substring($"payload", 1, 8))), 1, 16)
    val sniffed = when(prefix.startsWith("89504E470D0A1A0A"), "png")
      .when(prefix.startsWith("FFD8FF"), "jpeg")
      .when(prefix.startsWith("52494646"), "riff")
      .otherwise("raw")
    documents(s, d)
      .select(element_at(types, declaredIdx + 1).as("declared"),
        payload.as("payload"))
      .select($"declared", sniffed.as("sniffed"), length($"payload").as("nb"))
      .groupBy($"declared", $"sniffed")
      .agg(count(lit(1)).as("n_payloads"),
        sum($"nb").cast("long").as("byte_mass"))
      .withColumn("mismatch", $"declared" =!= $"sniffed")
  }

  val m16Sql: String =
    """WITH planted AS (
      |  SELECT doc_id, text,
      |    ['png','jpeg','riff','raw'][CAST(doc_id % 4 AS INTEGER) + 1]
      |      AS declared,
      |    CASE WHEN doc_id % 17 = 0
      |      THEN CAST((doc_id % 4 + 1) % 4 AS INTEGER)
      |      ELSE CAST(doc_id % 4 AS INTEGER) END AS aidx
      |  FROM documents
      |), p AS (
      |  SELECT declared,
      |    unhex(['89504E470D0A1A0A','FFD8FF','52494646',''][aidx + 1])
      |      || encode(text) AS payload
      |  FROM planted
      |), sn AS (
      |  SELECT declared, octet_length(payload) AS nb,
      |    CASE
      |      WHEN starts_with(substr(upper(hex(payload)), 1, 16),
      |                       '89504E470D0A1A0A') THEN 'png'
      |      WHEN starts_with(substr(upper(hex(payload)), 1, 16),
      |                       'FFD8FF') THEN 'jpeg'
      |      WHEN starts_with(substr(upper(hex(payload)), 1, 16),
      |                       '52494646') THEN 'riff'
      |      ELSE 'raw' END AS sniffed
      |  FROM p
      |)
      |SELECT declared, sniffed, COUNT(*) AS n_payloads,
      |  CAST(SUM(nb) AS BIGINT) AS byte_mass,
      |  declared <> sniffed AS mismatch
      |FROM sn GROUP BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m16_modality_sniff" -> (m16ModalitySniff _),
    "m17_snapshot_transfer" -> (m17SnapshotTransfer _),
    "m15_byte_profile"  -> (m15PayloadByteProfile _),
    "m14_cdc_storage_dedup" -> (m14CdcStorageDedup _),
    "m13_storage_dedup" -> (m13StorageDedup _),
    "m11_perceptual_clusters" -> (m11PerceptualClusters _),
    "m12_cdc_neardup"         -> (m12CdcNearDup _),
    "m10_payload_index_probe" -> (m10PayloadIndexProbe _),
    "m18_payload_delete_probe" -> (m18PayloadDeleteProbe _),
    "m09_bench_decontamination" -> (m09BenchDecontamination _),
    "m08_delta_payloads"  -> (m08DeltaPayloads _),
    "m07_perceptual_neardup" -> (m07PerceptualNearDup _),
    "m06_chunk_neardup"   -> (m06ChunkNearDup _),
    "m01_multimodal_meta" -> (m01MultimodalMeta _),
    "m02_payload_bytes"   -> (m02PayloadBytes _),
    "m03_chunk_sample"    -> (m03ChunkSample _),
    "m04_resize_stub"     -> (m04ResizeStub _),
    "m05_payload_dedup"   -> (m05PayloadDedup _),
  )

  /** Spark's split keeps a trailing empty chunk when the text length is
    * an exact multiple of the chunk size (split limit -1) — the oracle
    * mirrors that with an extra zero-length chunk. */
  val m03Sql: String =
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |  i AS chunk_id,
      |  len(substr(text, i * 100 + 1, 100)) AS chunk_len
      |FROM (SELECT doc_id, text,
      |        CASE WHEN len(text) % 100 = 0 THEN len(text) // 100 + 1
      |             ELSE CAST(ceil(len(text) / 100.0) AS INTEGER) END AS nc
      |      FROM documents),
      |  unnest(range(0, nc)) AS t(i)""".stripMargin

  // def, not val: the golden-snapshot oracle path resolves the sf tag
  // at dump time (GoldenGen.setSfTag), after object initialization
  def oracles: Map[String, String] = Map(
    "m16_modality_sniff" -> m16Sql,
    // m17: Gear chunk spans are engine-side (the m12/m14 argument) and
    // the report is integer rollups + anti-join membership — golden
    "m17_snapshot_transfer" -> graft.GoldenGen.oracle("m17_snapshot_transfer"),
    "m15_byte_profile"  -> m15Sql,
    "m13_storage_dedup" -> m13Sql,
    // m14: gear chunk spans are engine-side but a sequential pure
    // function per row (the m12 argument) and the rollups are integer
    // sums — golden-snapshot hard check
    "m14_cdc_storage_dedup" -> graft.GoldenGen.oracle("m14_cdc_storage_dedup"),
    // m10: same engine-side fingerprints as m07, same deterministic
    // banding/verify chain → golden-snapshot hard check; ≡ m07
    // restricted to delta-touching pairs (exact by pigeonhole
    // coverage), the restriction spec-asserted in MultimodalSpec
    "m10_payload_index_probe" -> graft.GoldenGen.oracle("m10_payload_index_probe"),
    // m18: m10 after deletions — deterministic like m10 (the removal
    // mask only restricts the pair set) → its own golden; delete ≡
    // rebuild-without-removed spec-pinned in IndexDeletionSpec
    "m18_payload_delete_probe" -> graft.GoldenGen.oracle("m18_payload_delete_probe"),
    // m11: CC over m07's golden-safe edge set — deterministic end to
    // end (min-label propagation), golden-snapshot hard check
    "m11_perceptual_clusters" -> graft.GoldenGen.oracle("m11_perceptual_clusters"),
    // m12: gear chunk hashes are engine-side but a sequential pure
    // function per row; the Jaccard join is m06's — golden-hashed
    "m12_cdc_neardup"         -> graft.GoldenGen.oracle("m12_cdc_neardup"),
    // m09: blockhash fingerprints are engine-specific but the whole
    // flag→argmin→byte-label chain is deterministic and total-ordered
    // → golden-snapshot hard check, the m07/d05 discipline
    "m09_bench_decontamination" -> graft.GoldenGen.oracle("m09_bench_decontamination"),
    "m08_delta_payloads" -> m08Sql,
    // m07: engine-specific (blockhash over utf-8 payload bytes) but
    // fully deterministic → golden-snapshot hard check + ScalaTest
    // ground truth on planted perturbations.
    "m07_perceptual_neardup" -> graft.GoldenGen.oracle("m07_perceptual_neardup"),
    "m06_chunk_neardup" -> m06Sql,
    "m05_payload_dedup" -> m05Sql,
    "m02_payload_bytes" -> m02Sql,
    "m03_chunk_sample"  -> m03Sql,
    "m04_resize_stub"   -> m04Sql,
    // m01: xxhash64-derived stub fields are Spark-side but deterministic
    // → golden-snapshot hard check (see graft.GoldenGen) + ScalaTest.
    "m01_multimodal_meta" -> graft.GoldenGen.oracle("m01_multimodal_meta"),
  )
}
