package graft.queries

import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.core.Tables
import graft.functions.Udfs
import graft.multimodal.Multimodal

/** Query-surface + multimodal + custom-function queries: the pieces whose
  * Spark side goes beyond what DuckDB can mirror get rows-only gates and
  * exact-value ScalaTest specs (QlSpec, UdfsSpec, MultimodalSpec).
  */
object Surface {

  val defs: Seq[QueryDef] = Seq(

    // ---- multimodal: binary landing + typed metadata (oracle-checked) ----
    QueryDef(
      "mm_binary_metadata",
      "Opaque binary column + typed metadata struct; md5/byte-length over the blob",
      Some("""
        SELECT doc_id,
               'text/plain' AS mime,
               octet_length(CAST(text AS BLOB)) AS n_bytes,
               lang,
               md5(text) AS blob_md5
        FROM documents
      """)) { (s, dir) =>
      Multimodal.pack(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("meta.mime").as("mime"),
          col("meta.n_bytes").as("n_bytes"), col("meta.lang").as("lang"),
          md5(col("blob")).as("blob_md5"))
    },

    // ---- multimodal: batched feature extraction (rows-only; exact values
    //      pinned in MultimodalSpec) ---------------------------------------
    QueryDef(
      "mm_feature_extract",
      "mapPartitions batched decode → fixed-dim feature vector per blob (decoder stubbed deterministically; oracle mirrors the stride-average over ascii() since the fixture blobs are ASCII)",
      // Float parity: the decoder divides an exact integer byte-sum by an
      // exact count IN FLOAT; the oracle does the same division in REAL
      // (same IEEE binary32 op on identical operands → identical bits),
      // then both sides widen to double (exact) before round(…, 3).
      Some("""
        WITH base AS (
          SELECT doc_id, text, length(text) AS len,
                 greatest(1, length(text) // 8) AS stride
          FROM documents
        ),
        f AS (
          SELECT doc_id, len,
                 [coalesce(list_sum([ascii(text[j]) for j in range(i*stride+1, least(len, (i+1)*stride)+1)]), 0) for i in range(0, 8)] AS sums,
                 [least(len, (i+1)*stride) - i*stride for i in range(0, 8)] AS ns
          FROM base
        )
        SELECT doc_id, CAST(len AS INTEGER) AS n_bytes,
               round(CAST(CASE WHEN ns[1] <= 0 THEN CAST(0 AS REAL)
                          ELSE CAST(sums[1] AS REAL) / CAST(ns[1] AS REAL) END AS DOUBLE), 3) AS f0,
               round(CAST(CASE WHEN ns[8] <= 0 THEN CAST(0 AS REAL)
                          ELSE CAST(sums[8] AS REAL) / CAST(ns[8] AS REAL) END AS DOUBLE), 3) AS f7
        FROM f
      """)) { (s, dir) =>
      Multimodal.extractFeatures(Multimodal.pack(Tables(s, dir, "documents")))
        .select(col("doc_id"), col("n_bytes"),
          round(element_at(col("features"), 1).cast("double"), 3).as("f0"),
          round(element_at(col("features"), 8).cast("double"), 3).as("f7"))
    },

    // ---- multimodal: declarative frame sampling (oracle-checked via the
    //      ASCII-backed fixture blobs: byte slices == char slices) ---------
    QueryDef(
      "mm_frame_sample",
      "Video-style frame sampling: blob -> fixed 64-byte frames, every 4th kept; sequence+substring, no UDF",
      Some("""
        SELECT doc_id, frame_idx,
               substr(text, CAST(frame_idx * 64 + 1 AS BIGINT), 64) AS frame_str,
               length(substr(text, CAST(frame_idx * 64 + 1 AS BIGINT), 64)) AS frame_len
        FROM (
          SELECT doc_id, text,
                 unnest([i for i in range(0, CAST(ceil(n_chars / 64.0) AS BIGINT), 4)]) AS frame_idx
          FROM documents WHERE n_chars > 0
        )
      """)) { (s, dir) =>
      Multimodal.frameSample(Multimodal.pack(Tables(s, dir, "documents")), 64, 4)
        .select(col("doc_id"), col("frame_idx"),
          col("frame").cast("string").as("frame_str"),
          length(col("frame")).cast("long").as("frame_len"))
    },

    // ---- multimodal: REAL format decode (WAV/BMP headers + PCM peak) ----
    // Even doc_ids are synthesized as genuine PCM16 WAV files, odd as
    // genuine 24bpp BMPs, with parameters derived arithmetically from
    // doc_id; the Spark side round-trips encode→decode through the real
    // MediaCodecs parsers (magic-byte sniff, RIFF chunk walk, BMP header,
    // sample-level peak scan), and the oracle predicts every decoded field
    // from the same arithmetic — an end-to-end gate on a real decode
    // branch, not the stub.
    QueryDef(
      "mm_media_decode",
      "Real WAV/BMP encode→decode round trip: sniffed mime + parsed header fields + PCM peak",
      Some("""
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'audio/wav'
                    ELSE 'image/bmp' END AS mime,
               CASE WHEN doc_id % 2 = 0
                    THEN CAST(8000 + (doc_id % 5) * 1000 AS INTEGER) END AS sample_rate,
               CASE WHEN doc_id % 2 = 0
                    THEN CAST(1 + (doc_id // 2) % 2 AS INTEGER) END AS channels,
               CASE WHEN doc_id % 2 = 0
                    THEN CAST(16 + doc_id % 32 AS BIGINT) END AS n_frames,
               CASE WHEN doc_id % 2 = 0
                    THEN CAST((doc_id % 100) * 300 + 100 AS INTEGER) END AS peak_abs,
               CASE WHEN doc_id % 2 = 1
                    THEN CAST(4 + doc_id % 16 AS INTEGER) END AS width,
               CASE WHEN doc_id % 2 = 1
                    THEN CAST(2 + doc_id % 8 AS INTEGER) END AS height
        FROM documents
      """)) { (s, dir) =>
      Multimodal.probeMedia(
        Multimodal.synthesizeMedia(Tables(s, dir, "documents")))
    },

    // ---- multimodal: corrupt-blob quarantine (oracle-checked) ------------
    // The decoders' failure branch made driver-visible, mirroring N7's
    // type-dispatch on malformed media (etl_properties.py:706-749) and the
    // L3 quarantine pattern: a deterministic corruption pass (truncation,
    // magic-byte damage) runs over the real synthesized containers, the
    // REAL parsers return None instead of throwing, and failures route to
    // a quarantine bucket counted per sniffed mime — the oracle predicts
    // every bucket from the same doc_id arithmetic. At 100 TB this is the
    // contract that matters: corrupt bytes must cost one partition-local
    // decode attempt, never a job failure.
    QueryDef(
      "mm_decode_quarantine",
      "Corrupt-media quarantine: deterministic truncation/magic damage → real WAV/BMP parsers return None → per-mime ok/quarantined counts",
      Some("""
        WITH cls AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 IN (0, 1) THEN 'application/octet-stream'
                      WHEN doc_id % 2 = 0 THEN 'audio/wav'
                      ELSE 'image/bmp' END AS mime,
                 CASE WHEN doc_id % 7 IN (0, 1, 2) THEN 'quarantined'
                      ELSE 'ok' END AS status
          FROM documents
        )
        SELECT mime, status, CAST(count(*) AS BIGINT) AS n_blobs,
               min(doc_id) AS min_id, max(doc_id) AS max_id
        FROM cls GROUP BY mime, status
      """)) { (s, dir) =>
      val probed = Multimodal.probeMedia(
        Multimodal.corruptMedia(
          Multimodal.synthesizeMedia(Tables(s, dir, "documents"))))
      // quarantine = the parser could not produce a decoded header:
      // unrecognizable container, or a recognized magic whose header
      // fields failed to parse (truncated fmt chunk / short BMP header)
      val quarantined = col("mime") === "application/octet-stream" ||
        (col("mime") === "audio/wav" && col("sample_rate").isNull) ||
        (col("mime") === "image/bmp" && col("width").isNull)
      probed
        .withColumn("status", when(quarantined, "quarantined").otherwise("ok"))
        .groupBy(col("mime"), col("status"))
        .agg(count(lit(1)).as("n_blobs"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
    },

    // ---- multimodal: frame-level dedup (video near-dup shape) ------------
    // The standard video near-dup trick: hash sampled frames and find
    // content shared across assets — here over frameSample's 64-byte
    // frames. One frame-hash groupBy is the only exchange, and it carries
    // 16-byte hashes, never frame bytes; at 100 TB of video the same plan
    // holds because sampled-frame hashes are a tiny fraction of the blob
    // volume. Oracle recomputes the hashes from text slices (the fixture
    // blobs are ASCII, so byte slices == char slices, as mm_frame_sample
    // already pins).
    QueryDef(
      "mm_frame_dedup",
      "Cross-asset frame dedup: md5 over sampled 64-byte frames, repeated-frame groups with occurrence + distinct-doc counts; hashes shuffle, frame bytes never do",
      Some("""
        WITH fr AS (
          SELECT doc_id,
                 md5(substr(text, CAST(frame_idx * 64 + 1 AS BIGINT), 64)) AS h
          FROM (
            SELECT doc_id, text,
                   unnest([i for i in range(0, CAST(ceil(n_chars / 64.0) AS BIGINT), 4)]) AS frame_idx
            FROM documents WHERE n_chars > 0)
        )
        SELECT h AS frame_hash, CAST(count(*) AS BIGINT) AS n_occ,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM fr GROUP BY h HAVING count(*) > 1
      """)) { (s, dir) =>
      Multimodal.frameSample(Multimodal.pack(Tables(s, dir, "documents")), 64, 4)
        .select(col("doc_id"), md5(col("frame")).as("frame_hash"))
        .groupBy(col("frame_hash"))
        .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_occ") > 1)
    },

    // ---- multimodal: perceptual-hash image near-dup join -----------------
    // The image dual of mm_frame_dedup: every BMP really decodes
    // (MediaCodecs.decodeBmpGray reads the 24bpp bottom-up pixel array),
    // folds to a 64-bit average-hash inside its partition, and only the
    // 8-byte signatures join — dd78's 4x16-bit pigeonhole makes d<=3 an
    // equi-join. The oracle never parses a byte: it recomputes the same
    // hash from the synthesis arithmetic, so a single flipped pixel in
    // the codec path breaks CORRECTNESS — the decode is genuinely tested.
    QueryDef(
      "mm_image_phash",
      "Perceptual-hash image near-dup join: real BMP pixel decode → 8x8-grid average-hash (integer-exact threshold gray*npx > sum) → Hamming<=3 pairs via the 16-bit-chunk pigeonhole equi-join; pixels never cross a shuffle, the oracle predicts every signature analytically from the synthesis formula",
      Some("""
        WITH imgs AS (
          SELECT doc_id AS id, CAST(4 + doc_id % 16 AS BIGINT) AS w,
                 CAST(2 + doc_id % 8 AS BIGINT) AS h
          FROM documents WHERE doc_id % 2 = 1
        ),
        pix AS (
          SELECT id, w, h, (x.g*31 + y.g*17 + id) % 256 AS gray
          FROM imgs,
               LATERAL unnest(generate_series(0, w - 1)) AS x(g),
               LATERAL unnest(generate_series(0, h - 1)) AS y(g)
        ),
        sums AS (
          SELECT id, w, h, CAST(sum(gray) AS BIGINT) AS s,
                 CAST(count(*) AS BIGINT) AS npx
          FROM pix GROUP BY 1, 2, 3
        ),
        bits AS (
          SELECT s.id, k.g AS k,
                 CASE WHEN ((((k.g % 8) * s.w) // 8)*31
                            + (((k.g // 8) * s.h) // 8)*17 + s.id) % 256 * s.npx > s.s
                      THEN 1 ELSE 0 END AS b
          FROM sums s, LATERAL unnest(generate_series(0, 63)) AS k(g)
        ),
        chunks AS (
          SELECT id, k // 16 AS ci, CAST(sum(b * (1 << (k % 16))) AS BIGINT) AS chunk
          FROM bits GROUP BY 1, 2
        ),
        sig AS (
          SELECT id, max(CASE WHEN ci = 0 THEN chunk END) AS c0,
                     max(CASE WHEN ci = 1 THEN chunk END) AS c1,
                     max(CASE WHEN ci = 2 THEN chunk END) AS c2,
                     max(CASE WHEN ci = 3 THEN chunk END) AS c3
          FROM chunks GROUP BY id
        ),
        cand AS (
          SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
          FROM chunks a JOIN chunks b
            ON a.ci = b.ci AND a.chunk = b.chunk AND a.id < b.id
        )
        SELECT doc_a, doc_b,
               CAST(bit_count(xor(sa.c0, sb.c0)) + bit_count(xor(sa.c1, sb.c1))
                  + bit_count(xor(sa.c2, sb.c2)) + bit_count(xor(sa.c3, sb.c3)) AS INT)
                 AS hamming
        FROM cand JOIN sig sa ON doc_a = sa.id JOIN sig sb ON doc_b = sb.id
        WHERE bit_count(xor(sa.c0, sb.c0)) + bit_count(xor(sa.c1, sb.c1))
            + bit_count(xor(sa.c2, sb.c2)) + bit_count(xor(sa.c3, sb.c3)) <= 3
      """)) { (s, dir) =>
      val sigs = Multimodal.imagePhash(
        Multimodal.synthesizeMedia(Tables(s, dir, "documents"))).cache()
      val chunks = sigs.select(col("doc_id"), col("sig"),
          explode(expr("sequence(0, 3)")).as("ci"))
        .withColumn("chunk", expr("(sig >> (16 * ci)) & 65535"))
      val cand = chunks.as("a").join(chunks.as("b"),
          col("a.ci") === col("b.ci") && col("a.chunk") === col("b.chunk") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.sig").as("sa"), col("b.sig").as("sb"))
        .distinct()
      cand.withColumn("hamming", expr("bit_count(sa ^ sb)"))
        .filter(col("hamming") <= 3)
        .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
    },

    // ---- MM8: audio energy-fingerprint near-dup join ---------------------
    // The audio twin of mm_image_phash: every even-id doc synthesizes a
    // REAL mono PCM16 WAV (RIFF container via MediaCodecs), the
    // fingerprint decodes the actual bytes back to samples and folds 64
    // index-proportional chunk energies into a 64-bit signature with an
    // integer-cross-multiplied threshold, and near-dups join via the same
    // 16-bit-chunk pigeonhole (Hamming<=3 lossless). The oracle predicts
    // every signature bit analytically from the synthesis arithmetic, so
    // a flipped byte anywhere in encode->RIFF walk->PCM pass fails
    // CORRECTNESS. PCM never crosses a shuffle; only 8-byte sigs travel.
    QueryDef(
      "mm_audio_fingerprint",
      "Audio near-dup join over real WAV decode: 64-chunk energy signature (chunk-mean |sample| vs global mean, integer cross-multiplied), Hamming<=3 pairs via the 16-bit-chunk pigeonhole equi-join; samples never leave their partition, the oracle recomputes signatures from the synthesis formula",
      Some("""
        WITH aud AS (
          SELECT doc_id AS id, CAST(96 + (doc_id % 16) * 8 AS BIGINT) AS n
          FROM documents WHERE doc_id % 2 = 0
        ),
        smp AS (
          SELECT id, n, i.g AS i,
                 abs(((i.g * 37 + (id % 251) * 101) % 512) - 256) AS a
          FROM aud, LATERAL unnest(generate_series(0, n - 1)) AS i(g)
        ),
        chunks0 AS (
          SELECT id, n, (i * 64) // n AS k,
                 CAST(SUM(a) AS BIGINT) AS csum,
                 CAST(COUNT(*) AS BIGINT) AS clen
          FROM smp GROUP BY 1, 2, 3
        ),
        tot AS (
          SELECT id, CAST(SUM(csum) AS BIGINT) AS total FROM chunks0 GROUP BY 1
        ),
        bits AS (
          SELECT c.id, c.k,
                 CASE WHEN c.csum * c.n > t.total * c.clen
                      THEN 1 ELSE 0 END AS b
          FROM chunks0 c JOIN tot t ON c.id = t.id
        ),
        ch AS (
          SELECT id, k // 16 AS ci,
                 CAST(sum(b * (1 << (k % 16))) AS BIGINT) AS chunk
          FROM bits GROUP BY 1, 2
        ),
        sig AS (
          SELECT id, max(CASE WHEN ci = 0 THEN chunk END) AS c0,
                     max(CASE WHEN ci = 1 THEN chunk END) AS c1,
                     max(CASE WHEN ci = 2 THEN chunk END) AS c2,
                     max(CASE WHEN ci = 3 THEN chunk END) AS c3
          FROM ch GROUP BY id
        ),
        cand AS (
          SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
          FROM ch a JOIN ch b
            ON a.ci = b.ci AND a.chunk = b.chunk AND a.id < b.id
        )
        SELECT doc_a, doc_b,
               CAST(bit_count(xor(sa.c0, sb.c0)) + bit_count(xor(sa.c1, sb.c1))
                  + bit_count(xor(sa.c2, sb.c2)) + bit_count(xor(sa.c3, sb.c3))
                 AS INT) AS hamming
        FROM cand JOIN sig sa ON doc_a = sa.id JOIN sig sb ON doc_b = sb.id
        WHERE bit_count(xor(sa.c0, sb.c0)) + bit_count(xor(sa.c1, sb.c1))
            + bit_count(xor(sa.c2, sb.c2)) + bit_count(xor(sa.c3, sb.c3)) <= 3
      """)) { (s, dir) =>
      val sigs = Multimodal.audioFingerprint(
        Multimodal.synthesizeAudioFp(Tables(s, dir, "documents"))).cache()
      val chunks = sigs.select(col("doc_id"), col("sig"),
          explode(expr("sequence(0, 3)")).as("ci"))
        .withColumn("chunk", expr("(sig >> (16 * ci)) & 65535"))
      val cand = chunks.as("a").join(chunks.as("b"),
          col("a.ci") === col("b.ci") && col("a.chunk") === col("b.chunk") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.sig").as("sa"), col("b.sig").as("sb"))
        .distinct()
      cand.withColumn("hamming", expr("bit_count(sa ^ sb)"))
        .filter(col("hamming") <= 3)
        .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
    },

    // ---- custom functions: uuid_v5 + trigram + RO ratio -------------------
    // Oracle strategy (the dd57 promotion pattern): trigram similarity is
    // restated independently in DuckDB SQL (per-word '  w '-padded 3-gram
    // Jaccard — pg_trgm semantics — via nested list lambdas); uuid_v5 and
    // the Ratcliff/Obershelp ratio are not SQL-expressible, so their
    // expected values are constants precomputed by INDEPENDENT reference
    // implementations — CPython's uuid.uuid5 (RFC 4122 §4.3, DNS
    // namespace) and difflib.SequenceMatcher(autojunk=False).ratio() —
    // over the fixed 25-row nation fixture (identical at every sf).
    QueryDef(
      "f_custom_functions",
      "uuid_v5 / trigram_sim / ratcliff-obershelp over nation names (UdfsSpec pins exact values)",
      Some("""
        WITH exp(n_nationkey, name_uuid, rev_ratio) AS (VALUES
            (0, 'eca51a0d-3ccf-5412-ad05-6f18cce37151', CAST(0.375 AS DOUBLE)),
            (1, 'fb64fdf1-8117-5655-b63f-5924c22d9909', CAST(0.375 AS DOUBLE)),
            (2, '08ae2c1e-da8e-5996-83e5-12499e500f23', CAST(0.375 AS DOUBLE)),
            (3, '187d4d60-fa1b-5a66-af61-0b26ba5503e8', CAST(0.375 AS DOUBLE)),
            (4, '942ecb3b-87b0-547e-af5b-f53c39739cc1', CAST(0.375 AS DOUBLE)),
            (5, '2aa6005f-35d9-5d53-b154-29c425182de5', CAST(0.375 AS DOUBLE)),
            (6, 'fc111dfb-2d36-5862-8c5d-1a85090b677c', CAST(0.375 AS DOUBLE)),
            (7, '6e30cff6-caa1-5ae8-8241-7f2562f9f2fb', CAST(0.375 AS DOUBLE)),
            (8, '11a8551b-326c-5174-a512-83ddc3dcb9c6', CAST(0.375 AS DOUBLE)),
            (9, 'bd214624-651e-5f46-b9ef-62230a7e1690', CAST(0.375 AS DOUBLE)),
            (10, 'bd55af78-598f-5e1a-8b76-dd42143ba89f', CAST(0.3333 AS DOUBLE)),
            (11, '4d3488b4-4c44-5305-b714-2e54f2fe0397', CAST(0.2222 AS DOUBLE)),
            (12, 'bcda4f32-f7b4-5145-b210-c81d8886d7b5', CAST(0.3333 AS DOUBLE)),
            (13, '95273278-1d57-572c-a8bc-da8c81365e09', CAST(0.3333 AS DOUBLE)),
            (14, '231b372e-949d-5550-bbe3-cc9716436f9d', CAST(0.3333 AS DOUBLE)),
            (15, 'a070391b-43ac-52bf-b945-8a71cf3316e8', CAST(0.3333 AS DOUBLE)),
            (16, 'b6bf5532-af85-512c-a4fc-d2138d6722e2', CAST(0.3333 AS DOUBLE)),
            (17, 'e136b322-6d08-549e-acea-b37278cd1a2c', CAST(0.3333 AS DOUBLE)),
            (18, '7a93bc64-0e22-55ce-ad16-1e3e83161859', CAST(0.3333 AS DOUBLE)),
            (19, 'bb9d566f-f040-5164-9c36-56350a96e2f0', CAST(0.3333 AS DOUBLE)),
            (20, 'd0a0e6a8-1813-56fa-8826-60db4ae16ffb', CAST(0.3333 AS DOUBLE)),
            (21, '99f02306-b641-538b-a9be-7997b33a7034', CAST(0.3333 AS DOUBLE)),
            (22, '49f08618-bc73-5aba-8a11-c8dd092a0758', CAST(0.2222 AS DOUBLE)),
            (23, 'c1ebfb67-5f6a-54ae-92c9-813868b597da', CAST(0.3333 AS DOUBLE)),
            (24, '42c9a6a5-5507-5607-be51-913616e8fb57', CAST(0.3333 AS DOUBLE))),
        tg AS (
          SELECT n_nationkey,
                 round(CAST(len(list_intersect(ga, gb)) AS DOUBLE)
                       / len(list_distinct(ga || gb)), 4) AS self_trigram
          FROM (
            SELECT n_nationkey,
              list_distinct(flatten(list_transform(
                list_filter(string_split_regex(lower(trim(n_name)), '[^a-z0-9]+'),
                            w -> len(w) > 0),
                w -> list_transform(range(1, len(w) + 2),
                                    i -> substring('  ' || w || ' ', i, 3))))) AS ga,
              list_distinct(flatten(list_transform(
                list_filter(string_split_regex(lower(trim(n_name || 'X')), '[^a-z0-9]+'),
                            w -> len(w) > 0),
                w -> list_transform(range(1, len(w) + 2),
                                    i -> substring('  ' || w || ' ', i, 3))))) AS gb
            FROM nation))
        SELECT n.n_nationkey, e.name_uuid, tg.self_trigram, e.rev_ratio
        FROM nation n
        JOIN exp e ON n.n_nationkey = e.n_nationkey
        JOIN tg ON n.n_nationkey = tg.n_nationkey
      """)) { (s, dir) =>
      Tables(s, dir, "nation").select(
        col("n_nationkey"),
        Udfs.uuid_v5(col("n_name")).as("name_uuid"),
        round(Udfs.trigram_sim(col("n_name"), concat(col("n_name"), lit("X"))), 4)
          .as("self_trigram"),
        round(Udfs.ro_ratio(col("n_name"), reverse(col("n_name"))), 4).as("rev_ratio"))
    })
}
