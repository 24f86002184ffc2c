package graft

/** DuckDB oracle SQL for the queries whose semantics depend on
  * engine-internal hashing (splitmix64 string folds, the MinHash
  * universal-hash family, random-hyperplane LSH planes, Spark's
  * xxhash64, SQ8 quantization). Until round 3 these were rows-only
  * checks; here each hash primitive is re-expressed as portable SQL:
  *
  *  - 64-bit wrap-around arithmetic runs in DuckDB HUGEINT (int128)
  *    over the domain [0, 2^64) — multiplication is decomposed into
  *    32-bit halves so no intermediate exceeds int128, shifts become
  *    division/multiplication by powers of two, and `xor` is DuckDB's
  *    native HUGEINT xor;
  *  - sequential char folds (stringHash / HashingEmbedder.tokenHash)
  *    become WITH RECURSIVE CTEs over the character position — the
  *    recursion depth is the max token length, the width the DISTINCT
  *    token/shingle set;
  *  - driver-seeded constants (the MinHash (a_i, b_i) family, the LSH
  *    plane matrix) are inlined as literals FROM THE SAME SCALA CODE
  *    the engine runs ([[graft.dedup.Dedup.hashFamily]],
  *    [[graft.index.RandomHyperplaneLsh.planes]]), so oracle and
  *    engine cannot drift;
  *  - MinHash LSH banding is verified by joining on the band's raw
  *    4-value sub-signature instead of reproducing Spark's xxhash64 of
  *    the slice — same candidate set unless xxhash64 collides (and a
  *    collision would still need to survive the exact-Jaccard verify).
  *
  * Every query stays a SINGLE SQL statement (CTEs only, no macros) —
  * the driver executes one statement per oracle.
  */
object OracleHashSql {

  private val W64 = BigInt("18446744073709551616") // 2^64
  private val W32 = 4294967296L                    // 2^32

  /** (a*b) mod 2^64 for HUGEINT expressions a, b in [0, 2^64):
    * a*b = a_lo*b + (a_hi*b_lo mod 2^32)<<32 (mod 2^64), every term
    * within int128 range.
    */
  private def mul64(a: String, b: String): String =
    s"((($a) % $W32) * ($b) + ((($a) // $W32) * (($b) % $W32) % $W32) * $W32) % $W64"

  /** Rotate-left by r on [0, 2^64): the shifted halves occupy disjoint
    * bits, so `|` is `+`. */
  private def rotl(x: String, r: Int): String =
    s"((($x) * ${BigInt(2).pow(r)}) % $W64 + (($x) // ${BigInt(2).pow(64 - r)}))"

  /** splitmix64 over [0, 2^64); `x` must be a SHORT expression (a
    * column reference) — it is replicated ~70x by the nesting. */
  private def smix(x: String): String = {
    val x1 = s"(($x) + 11400714819323198485) % $W64"
    val x2 = mul64(s"xor(($x1)::HUGEINT, (($x1) // 1073741824)::HUGEINT)", "13787848793156543929")
    val x3 = mul64(s"xor(($x2)::HUGEINT, (($x2) // 134217728)::HUGEINT)", "10723151780598845931")
    s"xor(($x3)::HUGEINT, (($x3) // 2147483648)::HUGEINT)"
  }

  /** java.lang.Math.rint (round half to even) for a DOUBLE expression. */
  private def rint(x: String): String =
    s"CASE WHEN ($x) = floor($x) + 0.5 THEN " +
      s"floor($x) + (CASE WHEN CAST(floor($x) AS BIGINT) % 2 = 0 THEN 0 ELSE 1 END) " +
      s"ELSE round($x) END"

  /** Recursive char-fold CTE pair: h = smix(h xor char) over positions,
    * seeded with `seed` — [[graft.dedup.Dedup.stringHash]] (seed
    * 1125899906842597) and HashingEmbedder.tokenHash (seed 42) share
    * this shape (the corpus is pure ASCII, so bytes == chars).
    * Expects a CTE named `src` with a single column named `tok`;
    * produces `fold`(tok, i, h) — read it at i = length(tok).
    */
  private def charFold(seed: Long): String = {
    val s1 = smix(s"xor($seed::HUGEINT, ascii(substr(tok,1,1))::HUGEINT)")
    val sr = smix("xor(h, ascii(substr(tok,i+1,1))::HUGEINT)")
    s"""fold AS (
       |  SELECT tok, 1 AS i, ($s1)::HUGEINT AS h FROM src
       |  UNION ALL
       |  SELECT tok, i+1, ($sr)::HUGEINT FROM fold WHERE i < length(tok)
       |)""".stripMargin
  }

  // ---- fingerprint_winnow ----------------------------------------
  // TextFunctions.winnowingFingerprints(k=5, w=4): Rabin-Karp base-257
  // mod 1e9+7 k-gram hashes (position-explicit — no rolling needed in
  // SQL: the rolling update is exact mod arithmetic, so direct
  // evaluation is identical), then min per w-window, dedup.
  private def fingerprintWinnowSql: String = {
    val (k, w, b, m) = (5, 4, 257L, 1000000007L)
    val terms = (0 until k)
      .map(j => s"ascii(substr(s, i+$j, 1))::BIGINT * ${BigInt(b).pow(k - 1 - j)}")
      .mkString(" + ")
    s"""WITH docs AS (
       |  SELECT doc_id, lower(text) AS s, length(text) - ${k - 1} AS n FROM documents
       |),
       |grams AS (
       |  SELECT doc_id, n, i, ($terms) % $m AS h
       |  FROM docs, (SELECT unnest(range(1, (SELECT max(n) FROM docs) + 1)) AS i)
       |  WHERE i <= n
       |),
       |wmins AS (
       |  SELECT doc_id, n, i,
       |    min(h) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS wm
       |  FROM grams
       |),
       |fps AS (
       |  SELECT doc_id, count(DISTINCT wm)::BIGINT AS n_fingerprints, arg_min(wm, i) AS first_fp
       |  FROM wmins WHERE i <= greatest(1, n - ${w - 1}) GROUP BY doc_id
       |)
       |SELECT d.doc_id, coalesce(f.n_fingerprints, 0) AS n_fingerprints, f.first_fp
       |FROM docs d LEFT JOIN fps f USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---- HashingEmbedder pipeline (embed_knn_text, rag_chunk_search) --
  // tokenHash seed 42; idx = h mod 64 (64 | 2^64, so unsigned mod ==
  // floorMod); sign from bit 32; votes per occurrence; L2-normalized
  // to FLOAT. The query string embeds through the same CTEs as unit
  // id -1, so the oracle needs no inlined query vector.
  private def embedKnnTextSql: String =
    s"""WITH RECURSIVE
       |units AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM documents
       |          UNION ALL SELECT -1, ['table','scan','merge']),
       |toksf AS (SELECT doc_id, tok
       |          FROM (SELECT doc_id, unnest(toks) AS tok FROM units) WHERE tok <> ''),
       |src AS (SELECT DISTINCT tok FROM toksf),
       |${charFold(42L)},
       |tokh AS (SELECT tok, h % 64 AS idx,
       |         CASE WHEN (h // $W32) % 2 = 0 THEN 1 ELSE -1 END AS sgn
       |         FROM fold WHERE i = length(tok)),
       |votes AS (SELECT t.doc_id, th.idx, SUM(th.sgn)::DOUBLE AS v
       |          FROM toksf t JOIN tokh th USING (tok) GROUP BY t.doc_id, th.idx),
       |norms AS (SELECT doc_id, sqrt(SUM(v*v)) AS nrm FROM votes GROUP BY doc_id),
       |comps AS (
       |  SELECT ids.doc_id, dim.d,
       |    CAST(coalesce(v.v, 0.0) / (CASE WHEN n.nrm = 0 THEN 1 ELSE n.nrm END) AS FLOAT) AS u
       |  FROM (SELECT DISTINCT doc_id FROM units) ids
       |  CROSS JOIN (SELECT unnest(range(0,64)) AS d) dim
       |  LEFT JOIN votes v ON v.doc_id = ids.doc_id AND v.idx = dim.d
       |  JOIN norms n ON n.doc_id = ids.doc_id
       |),
       |pairs AS (SELECT c.doc_id, c.u AS x, q.u AS y
       |          FROM comps c JOIN comps q ON q.doc_id = -1 AND q.d = c.d
       |          WHERE c.doc_id >= 0),
       |scores AS (SELECT doc_id,
       |  CASE WHEN SUM(x::DOUBLE*x::DOUBLE) = 0 OR SUM(y::DOUBLE*y::DOUBLE) = 0 THEN 0.0
       |       ELSE SUM(x::DOUBLE*y::DOUBLE)/(SQRT(SUM(x::DOUBLE*x::DOUBLE))*SQRT(SUM(y::DOUBLE*y::DOUBLE))) END AS s
       |  FROM pairs GROUP BY doc_id)
       |SELECT doc_id, ROUND(s,4) AS score FROM scores ORDER BY s DESC, doc_id LIMIT 5""".stripMargin

  private def ragChunkSearchSql: String =
    s"""WITH RECURSIVE
       |ctoks AS (SELECT doc_id, w, unnest(generate_series(1, len(w), 15)) AS start
       |          FROM (SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents)),
       |chunks AS (SELECT doc_id, CAST((start - 1) // 15 AS BIGINT) AS chunk_idx,
       |           list_slice(w, start, least(start + 19, len(w))) AS cw FROM ctoks),
       |units AS (SELECT doc_id, chunk_idx, cw FROM chunks
       |          UNION ALL SELECT -1, -1, ['table','scan','merge']),
       |toksf AS (SELECT doc_id, chunk_idx, tok
       |          FROM (SELECT doc_id, chunk_idx, unnest(cw) AS tok FROM units) WHERE tok <> ''),
       |src AS (SELECT DISTINCT tok FROM toksf),
       |${charFold(42L)},
       |tokh AS (SELECT tok, h % 64 AS idx,
       |         CASE WHEN (h // $W32) % 2 = 0 THEN 1 ELSE -1 END AS sgn
       |         FROM fold WHERE i = length(tok)),
       |votes AS (SELECT t.doc_id, t.chunk_idx, th.idx, SUM(th.sgn)::DOUBLE AS v
       |          FROM toksf t JOIN tokh th USING (tok) GROUP BY t.doc_id, t.chunk_idx, th.idx),
       |norms AS (SELECT doc_id, chunk_idx, sqrt(SUM(v*v)) AS nrm FROM votes GROUP BY doc_id, chunk_idx),
       |comps AS (
       |  SELECT ids.doc_id, ids.chunk_idx, dim.d,
       |    CAST(coalesce(v.v, 0.0) / (CASE WHEN n.nrm = 0 THEN 1 ELSE n.nrm END) AS FLOAT) AS u
       |  FROM (SELECT DISTINCT doc_id, chunk_idx FROM units) ids
       |  CROSS JOIN (SELECT unnest(range(0,64)) AS d) dim
       |  LEFT JOIN votes v ON v.doc_id = ids.doc_id AND v.chunk_idx = ids.chunk_idx AND v.idx = dim.d
       |  JOIN norms n ON n.doc_id = ids.doc_id AND n.chunk_idx = ids.chunk_idx
       |),
       |pairs AS (SELECT c.doc_id, c.chunk_idx, c.u AS x, q.u AS y
       |          FROM comps c JOIN comps q ON q.doc_id = -1 AND q.d = c.d
       |          WHERE c.doc_id >= 0),
       |scores AS (SELECT doc_id, chunk_idx,
       |  CASE WHEN SUM(x::DOUBLE*x::DOUBLE) = 0 OR SUM(y::DOUBLE*y::DOUBLE) = 0 THEN 0.0
       |       ELSE SUM(x::DOUBLE*y::DOUBLE)/(SQRT(SUM(x::DOUBLE*x::DOUBLE))*SQRT(SUM(y::DOUBLE*y::DOUBLE))) END AS s
       |  FROM pairs GROUP BY doc_id, chunk_idx)
       |SELECT doc_id, chunk_idx, ROUND(s,4) AS score FROM scores
       |ORDER BY ROUND(s,6) DESC, doc_id, chunk_idx LIMIT 5""".stripMargin

  // ---- dedup_simhash ----------------------------------------------
  // TextFunctions.simhash64: stringHash per token OCCURRENCE (seed
  // 1125899906842597), 64 bit-votes, 4x16-bit banding, hamming via
  // bit_count(xor) <= 3. Bit extraction works on the unsigned
  // representation (Spark's arithmetic shiftright + mask reads the
  // same bits).
  /** The banded-candidate + hamming-verify tail shared by every
    * 64-bit-sketch dedup oracle (text simhash, image aHash, audio
    * sign-delta, video keyframe — the replay of
    * Dedup.hammingBandPairs): expects a prior CTE `srcCte`(doc_id,
    * sh), emits the final SELECT at the given cut. One definition so
    * the band arithmetic cannot drift between the four replays.
    */
  private def hammingBandTail(srcCte: String, cut: Int): String =
    s"""banded AS (
       |  SELECT doc_id, sh, b.band_id, (sh // (1::HUGEINT << (band_id * 16))) % 65536 AS band_val
       |  FROM $srcCte CROSS JOIN (SELECT unnest(range(0,4)) AS band_id) b
       |),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    bit_count(xor(a.sh::UBIGINT, b.sh::UBIGINT))::BIGINT AS hamming
       |  FROM banded a JOIN banded b ON a.band_id = b.band_id AND a.band_val = b.band_val
       |  WHERE a.doc_id < b.doc_id
       |)
       |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= $cut ORDER BY id_a, id_b""".stripMargin

  private def dedupSimhashSql: String =
    s"""WITH RECURSIVE
       |toksall AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok FROM documents),
       |src AS (SELECT DISTINCT tok FROM toksall WHERE length(tok) > 0),
       |${charFold(1125899906842597L)},
       |tokh AS (SELECT tok, h FROM fold WHERE i = length(tok)),
       |bitvotes AS (
       |  SELECT t.doc_id, b.b,
       |    SUM(CASE WHEN (th.h // (1::HUGEINT << b.b)) % 2 = 1 THEN 1 ELSE -1 END) AS votes
       |  FROM toksall t JOIN tokh th USING (tok)
       |  CROSS JOIN (SELECT unnest(range(0,64)) AS b) b
       |  GROUP BY t.doc_id, b.b
       |),
       |sim AS (
       |  SELECT doc_id, SUM(CASE WHEN votes > 0 THEN (1::HUGEINT << b) ELSE 0 END)::HUGEINT AS sh
       |  FROM bitvotes GROUP BY doc_id
       |),
       |${hammingBandTail("sim", 3)}""".stripMargin

  // ---- multimodal_image_dedup -------------------------------------
  // aHash replayed from the P5 derivation (pixels = text bytes
  // cycled): 8x8 nearest-neighbor grid (the thumbnail oracle's
  // sampling rule at 8x8), mean threshold, bit (y*8+x); then the
  // dedup_simhash banding + bit_count(xor) verify over the hashes.
  // GREATEST(n_chars, 1) + the empty-text CASE mirror the engine's
  // max(bytes.length, 1) / all-zero-pixels clamp (syntheticPgm),
  // like the audio/video oracles — raw n_chars would modulo-by-zero.
  private def multimodalImageDedupSql: String =
    s"""WITH m AS (SELECT doc_id, text, GREATEST(n_chars, 1) AS n,
       |             16 + (GREATEST(n_chars, 1) % 16) AS w,
       |             16 + (GREATEST(n_chars, 1) % 8) AS h FROM documents),
       |cells AS (
       |  SELECT doc_id, (y.g * 8 + x.g) AS bit,
       |    CASE WHEN text = '' THEN 0
       |         ELSE unicode(substr(text,
       |           CAST(((y.g * h // 8) * w + (x.g * w // 8)) % n AS INT) + 1, 1)) END AS v
       |  FROM m, generate_series(0, 7) AS y(g), generate_series(0, 7) AS x(g)),
       |means AS (SELECT doc_id, AVG(CAST(v AS DOUBLE)) AS mu FROM cells GROUP BY doc_id),
       |ph AS (SELECT c.doc_id,
       |    SUM(CASE WHEN c.v > mm.mu THEN (1::HUGEINT << c.bit) ELSE 0::HUGEINT END)::HUGEINT AS sh
       |  FROM cells c JOIN means mm USING (doc_id) GROUP BY c.doc_id),
       |${hammingBandTail("ph", 8)}""".stripMargin

  // ---- multimodal_audio_dedup -------------------------------------
  // waveform sign-delta fingerprint replayed from the PCM derivation
  // (sample k = (byte(k % n) - 79) * 257, the multimodal_audio CTEs):
  // bit i = sample(i+1) > sample(i) over the first 65 samples, then
  // the shared banding + bit_count(xor) verify at the pigeonhole-
  // guaranteed <= 3 cut. The WHERE mirrors audioPhashes' >= 65-sample
  // guard against the generator's 192 + n%64 clip length (asserted at
  // generation time in Multimodal.syntheticWav): today it keeps every
  // doc, but a shorter-clip generator then diverges LOUDLY in rows
  // instead of silently in fingerprints.
  private def multimodalAudioDedupSql: String =
    s"""WITH m AS (SELECT doc_id, text, GREATEST(n_chars, 1) AS n FROM documents
       |           WHERE 192 + (GREATEST(n_chars, 1) % 64) >= 65),
       |s AS (SELECT doc_id, i.g AS k,
       |        (CASE WHEN text = '' THEN 0
       |              ELSE unicode(substr(text, CAST(i.g % n AS INT) + 1, 1)) END - 79) * 257 AS v
       |      FROM m, generate_series(0, 64) AS i(g)),
       |d AS (SELECT doc_id, k, v, lead(v) OVER (PARTITION BY doc_id ORDER BY k) AS nv FROM s),
       |ph AS (SELECT doc_id,
       |    SUM(CASE WHEN nv > v THEN (1::HUGEINT << k) ELSE 0::HUGEINT END)::HUGEINT AS sh
       |  FROM d WHERE k < 64 GROUP BY doc_id),
       |${hammingBandTail("ph", 3)}""".stripMargin

  // ---- multimodal_video_dedup -------------------------------------
  // keyframe aHash replayed from the GV01 derivation: frame 0's
  // pixels = text bytes cycled (offset 0) at the frame geometry
  // w = 8+(n%8), h = 8+(n%4); then the shared 8x8-grid/mean/bits
  // chain and the banded pairs at the pigeonhole-guaranteed <= 3 cut
  private def multimodalVideoDedupSql: String =
    s"""WITH m AS (SELECT doc_id, text, GREATEST(n_chars, 1) AS n,
       |             8 + (GREATEST(n_chars, 1) % 8) AS w,
       |             8 + (GREATEST(n_chars, 1) % 4) AS h FROM documents),
       |cells AS (
       |  SELECT doc_id, (y.g * 8 + x.g) AS bit,
       |    CASE WHEN text = '' THEN 0
       |         ELSE unicode(substr(text,
       |           CAST(((y.g * h // 8) * w + (x.g * w // 8)) % n AS INT) + 1, 1)) END AS v
       |  FROM m, generate_series(0, 7) AS y(g), generate_series(0, 7) AS x(g)),
       |means AS (SELECT doc_id, AVG(CAST(v AS DOUBLE)) AS mu FROM cells GROUP BY doc_id),
       |ph AS (SELECT c.doc_id,
       |    SUM(CASE WHEN c.v > mm.mu THEN (1::HUGEINT << c.bit) ELSE 0::HUGEINT END)::HUGEINT AS sh
       |  FROM cells c JOIN means mm USING (doc_id) GROUP BY c.doc_id),
       |${hammingBandTail("ph", 3)}""".stripMargin

  // ---- pipeline_media_survivors -----------------------------------
  // keep-first over the UNION of the image and audio perceptual pair
  // graphs: a doc is dropped iff it is the id_b (higher-id) side of
  // any pair — the two full dedup replays embedded as subqueries, so
  // this composition can never disagree with the individual gates
  private def pipelineMediaSurvivorsSql: String =
    s"""WITH dropped AS (
       |  SELECT id_b FROM ($multimodalImageDedupSql) img
       |  UNION
       |  SELECT id_b FROM ($multimodalAudioDedupSql) aud
       |)
       |SELECT lang, count(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum
       |FROM documents WHERE doc_id NOT IN (SELECT id_b FROM dropped)
       |GROUP BY lang ORDER BY lang""".stripMargin

  // ---- dedup_minhash ----------------------------------------------
  // Dedup.minhashNearDups(3-shingles, 64 hashes, 16 bands, seed 42,
  // threshold 0.5). x = floorMod(stringHash(shingle), p) needs the
  // SIGNED value of the unsigned fold; banding joins on the raw
  // 4-value sub-signature (see object Scaladoc).
  /** The MinHash pipeline's CTE chain (shingles → splitmix64 → 64-hash
    * signatures → 4-row bands → candidate join → exact-Jaccard verify),
    * shared by the pair query and the component query so the two can
    * never disagree about what a near-dup pair is. Ends with `jac`
    * (id_a, id_b, j) unfiltered — callers apply the 0.5 threshold.
    */
  private def dedupMinhashCtes: String = {
    val p = 2147483647L
    val fam = dedup.Dedup.hashFamily(64, 42L)
    val famValues = fam.zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }
      .mkString(", ")
    s"""WITH RECURSIVE
       |docw AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents),
       |docsh AS (SELECT doc_id, sh FROM (
       |    SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
       |    FROM docw, (SELECT unnest(range(1, (SELECT max(len(w)) FROM docw))) AS i)
       |    WHERE i + 2 <= len(w))),
       |src AS (SELECT DISTINCT sh AS tok FROM docsh),
       |${charFold(1125899906842597L)},
       |shx AS (SELECT tok AS sh,
       |  (((h - CASE WHEN h >= 9223372036854775808 THEN $W64::HUGEINT ELSE 0::HUGEINT END) % $p) + $p) % $p AS x
       |  FROM fold WHERE i = length(tok)),
       |fam(i, a, b) AS (VALUES $famValues),
       |sigs AS (
       |  SELECT d.doc_id, f.i, MIN((f.a * s.x + f.b) % $p) AS v
       |  FROM docsh d JOIN shx s USING (sh) CROSS JOIN fam f
       |  GROUP BY d.doc_id, f.i
       |),
       |bands AS (
       |  SELECT doc_id, i // 4 AS band_id, list(v ORDER BY i) AS bsig
       |  FROM sigs GROUP BY doc_id, band_id
       |),
       |cands AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.bsig = b.bsig
       |  WHERE a.doc_id < b.doc_id
       |),
       |sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM docsh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.id_a, c.id_b, count(*)::BIGINT AS ni
       |  FROM cands c JOIN docsh sa ON sa.doc_id = c.id_a
       |               JOIN docsh sb ON sb.doc_id = c.id_b AND sb.sh = sa.sh
       |  GROUP BY c.id_a, c.id_b
       |),
       |jac AS (
       |  SELECT c.id_a, c.id_b,
       |    coalesce(i.ni, 0)::DOUBLE / (na.n + nb.n - coalesce(i.ni, 0))::DOUBLE AS j
       |  FROM cands c
       |  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
       |  JOIN sizes na ON na.doc_id = c.id_a
       |  JOIN sizes nb ON nb.doc_id = c.id_b
       |)""".stripMargin
  }

  /** chunk_cdc: content-defined chunk counts. A break follows any
    * NON-LAST token whose char-fold hash (same seed + fold as the
    * simhash token hash) has low 4 bits zero; n_chunks = breaks + 1.
    * The fold h lives in [0, 2^64), so `h % 16` is exactly the
    * engine's `h & 15` on the signed long.
    */
  private def chunkCdcSql: String =
    s"""WITH RECURSIVE
       |units AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents),
       |toks AS (SELECT doc_id, w[i] AS tok
       |         FROM units, (SELECT unnest(range(1, (SELECT max(len(w)) FROM units))) AS i)
       |         WHERE i <= len(w) - 1),
       |src AS (SELECT DISTINCT tok FROM toks),
       |${charFold(1125899906842597L)},
       |bnd AS (SELECT tok FROM fold WHERE i = length(tok) AND h % 16 = 0),
       |breaks AS (SELECT t.doc_id, count(*)::BIGINT AS b
       |           FROM toks t JOIN bnd USING (tok) GROUP BY t.doc_id)
       |SELECT u.doc_id, CAST(len(u.w) AS BIGINT) AS n_tokens,
       |  CAST(1 + COALESCE(b.b, 0) AS BIGINT) AS n_chunks,
       |  ROUND(CAST(len(u.w) AS DOUBLE) / (1 + COALESCE(b.b, 0)), 4) AS avg_chunk_tokens
       |FROM units u LEFT JOIN breaks b USING (doc_id) ORDER BY u.doc_id""".stripMargin

  private def dedupMinhashSql: String =
    s"""$dedupMinhashCtes
       |SELECT id_a, id_b, ROUND(j, 4) AS jaccard FROM jac WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin

  // ---- dedup_incremental ------------------------------------------
  // The engine bands ONLY the odd-id batch against the even-id
  // corpus's stored band table; the oracle replays the FULL MinHash
  // pipeline and restricts verified pairs to cross-parity ones. Equal
  // results prove the incremental path agrees exactly with what a
  // complete re-dedup would conclude about corpus×batch pairs —
  // banding both sides with the same family and joining on the same
  // band values makes the cross-parity slice of the full candidate
  // set identical to the batch-vs-corpus candidate set.
  private def dedupIncrementalSql: String =
    s"""$dedupMinhashCtes
       |SELECT CASE WHEN id_a % 2 = 1 THEN id_a ELSE id_b END AS batch_id,
       |  count(*) AS n_matches, ROUND(MAX(j), 4) AS best_j
       |FROM jac WHERE j >= 0.5 AND (id_a % 2) <> (id_b % 2)
       |GROUP BY 1 ORDER BY batch_id""".stripMargin

  // ---- dedup_ingest_stream_wb ---------------------------------------
  // The within-batch variant: evidence = cross-parity matches (the
  // standing-corpus probe, attributed to the odd/batch side) UNION
  // within-batch pairs (both odd, SAME doc_id mod 6 micro-batch class,
  // attributed to BOTH ends — either doc is the duplicate depending on
  // admission order). The engine computes the second kind with a
  // batch-local MinHash self-join; banding family and verify are
  // identical to the corpus probe, so this one full-replay restriction
  // covers both evidence kinds.
  private def dedupIngestWithinBatchSql: String =
    s"""$dedupMinhashCtes
       |SELECT batch_id, count(*) AS n_matches, ROUND(MAX(j), 4) AS best_j
       |FROM (
       |  SELECT CASE WHEN id_a % 2 = 1 THEN id_a ELSE id_b END AS batch_id, j
       |  FROM jac WHERE j >= 0.5 AND (id_a % 2) <> (id_b % 2)
       |  UNION ALL
       |  SELECT id_a AS batch_id, j FROM jac
       |  WHERE j >= 0.5 AND id_a % 2 = 1 AND id_b % 2 = 1 AND (id_a % 6) = (id_b % 6)
       |  UNION ALL
       |  SELECT id_b AS batch_id, j FROM jac
       |  WHERE j >= 0.5 AND id_a % 2 = 1 AND id_b % 2 = 1 AND (id_a % 6) = (id_b % 6)
       |)
       |GROUP BY 1 ORDER BY batch_id""".stripMargin

  /** Connected components of the MinHash pair graph, walked with a
    * recursive reachability CTE: node reaches itself; if an edge joins
    * u—v and v reaches r, then u reaches r (edges symmetrized, UNION
    * dedups so the fixpoint terminates). component_id = min reachable
    * id — a different component algorithm than the engine's label
    * propagation, agreeing only if both are correct.
    */
  private def dedupComponentsSql: String =
    s"""$dedupMinhashCtes,
       |prs AS (SELECT id_a, id_b FROM jac WHERE j >= 0.5),
       |edges2 AS (SELECT id_a AS u, id_b AS v FROM prs
       |           UNION ALL SELECT id_b, id_a FROM prs),
       |reach AS (
       |  SELECT u AS node, u AS r FROM edges2
       |  UNION
       |  SELECT e.u AS node, t.r FROM reach t JOIN edges2 e ON e.v = t.node
       |)
       |SELECT node AS doc_id, MIN(r) AS component_id FROM reach
       |GROUP BY node ORDER BY doc_id""".stripMargin

  /** Cluster-size histogram over the same recursive-reachability
    * components as [[dedupComponentsSql]] — a family the engine's
    * label propagation splits or merges changes a histogram bucket.
    */
  private def dedupClusterStatsSql: String =
    s"""$dedupMinhashCtes,
       |prs AS (SELECT id_a, id_b FROM jac WHERE j >= 0.5),
       |edges2 AS (SELECT id_a AS u, id_b AS v FROM prs
       |           UNION ALL SELECT id_b, id_a FROM prs),
       |reach AS (
       |  SELECT u AS node, u AS r FROM edges2
       |  UNION
       |  SELECT e.u AS node, t.r FROM reach t JOIN edges2 e ON e.v = t.node
       |),
       |comp AS (SELECT node AS doc_id, MIN(r) AS component_id FROM reach GROUP BY node),
       |szs AS (SELECT component_id, count(*) AS sz FROM comp GROUP BY component_id)
       |SELECT sz AS cluster_size, count(*) AS n_clusters,
       |  CAST(SUM(sz) AS BIGINT) AS n_docs
       |FROM szs GROUP BY sz ORDER BY cluster_size""".stripMargin

  // ---- dedup_canon ------------------------------------------------
  // components via the same recursive reachability as dedup_components,
  // then the quality_logistic logit (bit-identical doubles — same IEEE
  // multiply-add chain) ranks members; canon = rank 1 per component.
  private def dedupCanonSql: String =
    s"""$dedupMinhashCtes,
       |prs AS (SELECT id_a, id_b FROM jac WHERE j >= 0.5),
       |edges2 AS (SELECT id_a AS u, id_b AS v FROM prs
       |           UNION ALL SELECT id_b, id_a FROM prs),
       |reach AS (
       |  SELECT u AS node, u AS r FROM edges2
       |  UNION
       |  SELECT e.u AS node, t.r FROM reach t JOIN edges2 e ON e.v = t.node
       |),
       |comp AS (SELECT node AS doc_id, MIN(r) AS component_id FROM reach GROUP BY node),
       |t2 AS (SELECT doc_id, trim(text) AS tt, string_split_regex(trim(text), ' +') AS w2 FROM documents),
       |m2 AS (SELECT doc_id, CAST(len(w2) AS DOUBLE) AS nt,
       |  CASE WHEN len(w2) = 0 THEN 0.0
       |       ELSE CAST(length(regexp_replace(tt, ' +', '', 'g')) AS DOUBLE) / len(w2) END AS atl,
       |  CASE WHEN len(w2) = 0 THEN 0.0
       |       ELSE CAST(len(list_filter(w2, x -> x IN ('the','is','and','of','to','a','in'))) AS DOUBLE) / len(w2) END AS sr,
       |  CASE WHEN len(w2) = 0 THEN 0.0
       |       ELSE 1.0 - CAST(len(list_distinct(w2)) AS DOUBLE) / len(w2) END AS dup
       |  FROM t2),
       |l2 AS (SELECT doc_id,
       |  0.05 * (nt - 56.0) + 2.0 * (atl - 4.5) - 6.0 * (sr - 0.06) - 3.0 * (dup - 0.54) AS logit
       |  FROM m2),
       |j2 AS (SELECT c.component_id, c.doc_id, l2.logit
       |  FROM comp c JOIN l2 ON l2.doc_id = c.doc_id),
       |r2 AS (SELECT component_id, doc_id, logit,
       |  row_number() OVER (PARTITION BY component_id ORDER BY logit DESC, doc_id) AS rk
       |  FROM j2)
       |SELECT component_id,
       |  CAST(MAX(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT) AS canon_id,
       |  count(*) AS n_members,
       |  CAST(MAX(CASE WHEN rk = 1 THEN floor(logit * 10000) END) AS BIGINT) AS canon_logit_e4
       |FROM r2 GROUP BY component_id ORDER BY component_id""".stripMargin

  // ---- shared vector CTEs -----------------------------------------
  // `corpus`: the non-null embedding rows. `vn`: each row's FLOAT-
  // normalized components at 1-based index i (the candidateMatch /
  // SqKnn normalization). `scores`: exact cosine of every row against
  // corpus member vec_id 0 — the rerank used by the LSH and IVF
  // oracles (same shape as OracleSql.knnScores).
  // parameterized over the corpus source so the clustered-fixture
  // gates replay the SAME machinery against read_parquet('<fixture>')
  private def corpusCteOver(from: String) =
    s"corpus AS (SELECT vec_id, embedding FROM $from WHERE embedding IS NOT NULL)"
  private val corpusCte = corpusCteOver("embeddings")

  private val vnCtes =
    s"""comps AS (SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1)::BIGINT AS i FROM corpus),
       |norms AS (SELECT vec_id, sqrt(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) AS nrm FROM comps GROUP BY vec_id),
       |vn AS (SELECT c.vec_id, c.i,
       |         CAST(CASE WHEN n.nrm = 0 THEN CAST(c.x AS DOUBLE) ELSE CAST(c.x AS DOUBLE) / n.nrm END AS FLOAT) AS x
       |       FROM comps c JOIN norms n ON n.vec_id = c.vec_id)""".stripMargin

  private def qScoresCtesOver(from: String) =
    s"""qpairs AS (SELECT e.vec_id, unnest(e.embedding) AS x, unnest(q.qe) AS y
       |           FROM corpus e, (SELECT embedding AS qe FROM $from WHERE vec_id = 0) q),
       |scores AS (SELECT vec_id,
       |    SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)) /
       |    (SQRT(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) * SQRT(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS s
       |  FROM qpairs GROUP BY vec_id)""".stripMargin
  private val qScoresCtes = qScoresCtesOver("embeddings")

  // ---- knn_lsh / knn_lsh_multiprobe -------------------------------
  // RandomHyperplaneLsh(8, 12, 42): the plane matrix is inlined from
  // the engine's own planes(64) (unit-normalized Gaussian floats);
  // rows hash their FLOAT-normalized vectors (candidateMatch
  // semantics); the query is corpus member vec_id 0, so its bucket
  // comes from the same CTE. Rerank = exact cosine on RAW embeddings.
  private def lshCtesOver(from: String): String = {
    val lsh = index.RandomHyperplaneLsh(8, 12, 42L)
    val flat = lsh.planes(64).flatten.flatten
    val flatLit = flat.mkString("[", ",", "]")
    s"""plvals AS (SELECT unnest($flatLit) AS w, unnest(range(0, ${flat.length})) AS f),
       |planes AS (SELECT f // 768 AS t, (f // 64) % 12 AS p, (f % 64)::BIGINT + 1 AS i, CAST(w AS FLOAT) AS w FROM plvals),
       |${corpusCteOver(from)},
       |$vnCtes,
       |dots AS (SELECT v.vec_id, pl.t, pl.p, SUM(CAST(v.x AS DOUBLE) * CAST(pl.w AS DOUBLE)) AS d
       |         FROM vn v JOIN planes pl ON pl.i = v.i GROUP BY v.vec_id, pl.t, pl.p),
       |buckets AS (SELECT vec_id, t, SUM(CASE WHEN d >= 0 THEN 1 << p ELSE 0 END)::BIGINT AS bkt
       |            FROM dots GROUP BY vec_id, t),
       |qb AS (SELECT t, bkt FROM buckets WHERE vec_id = 0),
       |${qScoresCtesOver(from)}""".stripMargin
  }
  private def lshCtes: String = lshCtesOver("embeddings")

  private def knnLshSql: String =
    s"""WITH $lshCtes,
       |cand AS (SELECT DISTINCT b.vec_id FROM buckets b JOIN qb ON qb.t = b.t AND qb.bkt = b.bkt)
       |SELECT c.vec_id, ROUND(s.s, 4) AS score, 'lsh' AS index_used
       |FROM cand c JOIN scores s ON s.vec_id = c.vec_id
       |ORDER BY s.s DESC, c.vec_id LIMIT 5""".stripMargin

  /** knn_join_graph_lsh: the 50-query LSH-blocked kNN graph. Reuses
    * the plane/bucket CTEs (buckets exist for EVERY corpus vector);
    * candidates are the (table, bucket) equi-join of the query subset
    * against the corpus with DISTINCT as the multi-table set-union,
    * then the exact-cosine rerank and per-query top-3 — the same
    * ranking discipline as knn_join_graph's exact oracle.
    */
  private def knnJoinGraphLshSql: String =
    s"""WITH $lshCtes,
       |qset AS (SELECT vec_id AS q_id FROM embeddings
       |  WHERE vec_id < 50 AND embedding IS NOT NULL),
       |cpairs AS (SELECT DISTINCT qs.q_id, b.vec_id AS c_id
       |  FROM qset qs JOIN buckets qb2 ON qb2.vec_id = qs.q_id
       |  JOIN buckets b ON b.t = qb2.t AND b.bkt = qb2.bkt AND b.vec_id <> qs.q_id),
       |px AS (SELECT cp.q_id, cp.c_id, unnest(a.embedding) AS x, unnest(bb.embedding) AS y
       |  FROM cpairs cp JOIN embeddings a ON a.vec_id = cp.q_id
       |  JOIN embeddings bb ON bb.vec_id = cp.c_id),
       |ps AS (SELECT q_id, c_id,
       |  SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)) /
       |  (SQRT(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) * SQRT(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS s
       |  FROM px GROUP BY q_id, c_id),
       |rankedg AS (SELECT q_id, c_id, s,
       |  row_number() OVER (PARTITION BY q_id ORDER BY s DESC, c_id) AS rn FROM ps)
       |SELECT q_id, rn, c_id AS neighbor_id, ROUND(s, 4) + 0 AS score
       |FROM rankedg WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin

  /** knn_serve_stream_rule: the 5-request serving stream answered
    * through the optimizer-rule probe. Replays each request's bucket
    * union (self EXCLUDED — serving semantics) and exact-cosine rerank
    * per request, rn ≤ 5 — [[knnJoinGraphLshSql]]'s shape at the
    * serving gate's request set and k. */
  private def knnServeStreamRuleSql: String =
    s"""WITH $lshCtes,
       |qset AS (SELECT vec_id AS q_id FROM embeddings
       |  WHERE vec_id < 5 AND embedding IS NOT NULL),
       |cpairs AS (SELECT DISTINCT qs.q_id, b.vec_id AS c_id
       |  FROM qset qs JOIN buckets qb2 ON qb2.vec_id = qs.q_id
       |  JOIN buckets b ON b.t = qb2.t AND b.bkt = qb2.bkt AND b.vec_id <> qs.q_id),
       |px AS (SELECT cp.q_id, cp.c_id, unnest(a.embedding) AS x, unnest(bb.embedding) AS y
       |  FROM cpairs cp JOIN embeddings a ON a.vec_id = cp.q_id
       |  JOIN embeddings bb ON bb.vec_id = cp.c_id),
       |ps AS (SELECT q_id, c_id,
       |  SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)) /
       |  (SQRT(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) * SQRT(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS s
       |  FROM px GROUP BY q_id, c_id),
       |rankeds AS (SELECT q_id, c_id, s,
       |  row_number() OVER (PARTITION BY q_id ORDER BY s DESC, c_id) AS rn FROM ps)
       |SELECT q_id, rn, c_id AS neighbor_id, ROUND(s, 4) + 0 AS score
       |FROM rankeds WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin

  /** knn_serve_stream_batched_mp: the 5-request serving stream at the
    * 1-bit multi-probe policy, answered batched. Per request: every
    * corpus row whose bucket is within Hamming 1 of the request's in
    * ANY table (the ball expansion [[graft.index.KnnJoin.lshServeBatched]]
    * applies request-side), self excluded, exact-cosine rerank, rn ≤ 5
    * — [[knnServeStreamRuleSql]] with the per-table bucket equality
    * widened to `bit_count(xor) <= 1`. */
  private def knnServeStreamBatchedMpSql: String =
    s"""WITH $lshCtes,
       |qset AS (SELECT vec_id AS q_id FROM embeddings
       |  WHERE vec_id < 5 AND embedding IS NOT NULL),
       |cpairs AS (SELECT DISTINCT qs.q_id, b.vec_id AS c_id
       |  FROM qset qs JOIN buckets qb2 ON qb2.vec_id = qs.q_id
       |  JOIN buckets b ON b.t = qb2.t AND b.vec_id <> qs.q_id
       |  WHERE bit_count(xor(qb2.bkt::UBIGINT, b.bkt::UBIGINT)) <= 1),
       |px AS (SELECT cp.q_id, cp.c_id, unnest(a.embedding) AS x, unnest(bb.embedding) AS y
       |  FROM cpairs cp JOIN embeddings a ON a.vec_id = cp.q_id
       |  JOIN embeddings bb ON bb.vec_id = cp.c_id),
       |ps AS (SELECT q_id, c_id,
       |  SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)) /
       |  (SQRT(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) * SQRT(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS s
       |  FROM px GROUP BY q_id, c_id),
       |rankeds AS (SELECT q_id, c_id, s,
       |  row_number() OVER (PARTITION BY q_id ORDER BY s DESC, c_id) AS rn FROM ps)
       |SELECT q_id, rn, c_id AS neighbor_id, ROUND(s, 4) + 0 AS score
       |FROM rankeds WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin

  /** knn_lsh_rule_filtered: the 1-bit multi-probe candidates
    * intersected with the user's `label <> 3` predicate,
    * exact-reranked — the filtered analog of knn_lsh_multiprobe,
    * served through the rule. */
  private def knnLshRuleFilteredSql: String =
    s"""WITH $lshCtes,
       |cand AS (SELECT DISTINCT b.vec_id FROM buckets b JOIN qb ON qb.t = b.t
       |         WHERE bit_count(xor(qb.bkt::UBIGINT, b.bkt::UBIGINT)) <= 1)
       |SELECT c.vec_id, ROUND(s.s, 4) AS score
       |FROM cand c
       |JOIN embeddings e ON e.vec_id = c.vec_id AND e.label <> 3
       |JOIN scores s ON s.vec_id = c.vec_id
       |ORDER BY s.s DESC, c.vec_id LIMIT 5""".stripMargin

  /** knn_filtered_adaptive: the guaranteed-k filtered ladder
    * ([[graft.index.LshIndexStore.searchFilteredAdaptive]]) replayed
    * RULE AND ALL: candidate counts at the exact-bucket and 1-bit
    * levels (each intersected with the `vec_id % 47 = 0` filter), the
    * escalation decision (first level with ≥ k survivors, else the
    * filtered subset), the chosen set's exact-cosine rerank, and the
    * reported `index_used`. An engine that escalates at the wrong
    * boundary — or serves the right neighbors from the wrong level —
    * flips the hash. */
  private def knnFilteredAdaptiveSql: String =
    s"""WITH $lshCtes,
       |filt AS (SELECT vec_id FROM corpus WHERE vec_id % 47 = 0),
       |cand0 AS (SELECT DISTINCT b.vec_id FROM buckets b
       |          JOIN qb ON qb.t = b.t AND qb.bkt = b.bkt
       |          JOIN filt f ON f.vec_id = b.vec_id),
       |cand1 AS (SELECT DISTINCT b.vec_id FROM buckets b
       |          JOIN qb ON qb.t = b.t
       |          JOIN filt f ON f.vec_id = b.vec_id
       |          WHERE bit_count(xor(qb.bkt::UBIGINT, b.bkt::UBIGINT)) <= 1),
       |lvl AS (SELECT CASE WHEN (SELECT COUNT(*) FROM cand0) >= 5 THEN 0
       |                    WHEN (SELECT COUNT(*) FROM cand1) >= 5 THEN 1
       |                    ELSE 2 END AS l),
       |chosen AS (SELECT vec_id FROM cand0 WHERE (SELECT l FROM lvl) = 0
       |  UNION ALL SELECT vec_id FROM cand1 WHERE (SELECT l FROM lvl) = 1
       |  UNION ALL SELECT vec_id FROM filt WHERE (SELECT l FROM lvl) = 2)
       |SELECT c.vec_id, ROUND(s.s, 4) AS score,
       |  CASE (SELECT l FROM lvl) WHEN 0 THEN 'lsh'
       |       WHEN 1 THEN 'lsh_mp1' ELSE 'brute' END AS index_used
       |FROM chosen c JOIN scores s ON s.vec_id = c.vec_id
       |ORDER BY s.s DESC, c.vec_id LIMIT 5""".stripMargin

  /** knn_filtered_adaptive_batched: the guaranteed-k filtered ladder
    * run for all 5 requests at once. Per request: ball candidates
    * (Hamming ≤ 1 in any table) surviving the `vec_id % 3 = 0` filter
    * with their MIN distance, exact-bucket/ball survivor counts, the
    * first level with ≥ k survivors (starved requests → brute over
    * the filtered subset), exact-cosine rerank of the chosen set, and
    * the per-request `index_used` — self excluded throughout. An
    * engine that escalates any single request at the wrong boundary,
    * serves a starved request from a half-empty ball, or
    * cross-contaminates levels between requests flips the hash. */
  private def knnFilteredAdaptiveBatchedSql: String =
    s"""WITH $lshCtes,
       |qset AS (SELECT vec_id AS q_id FROM embeddings
       |  WHERE vec_id < 5 AND embedding IS NOT NULL),
       |filt AS (SELECT vec_id FROM corpus WHERE vec_id % 3 = 0),
       |apairs AS (SELECT qs.q_id, b.vec_id AS c_id,
       |    MIN(CASE WHEN b.bkt = qb2.bkt THEN 0 ELSE 1 END) AS min_dist
       |  FROM qset qs
       |  JOIN buckets qb2 ON qb2.vec_id = qs.q_id
       |  JOIN buckets b ON b.t = qb2.t
       |    AND bit_count(xor(qb2.bkt::UBIGINT, b.bkt::UBIGINT)) <= 1
       |    AND b.vec_id <> qs.q_id
       |  JOIN filt f ON f.vec_id = b.vec_id
       |  GROUP BY qs.q_id, b.vec_id),
       |astats AS (SELECT q_id, SUM(CASE WHEN min_dist = 0 THEN 1 ELSE 0 END) AS n0,
       |    COUNT(*) AS n1
       |  FROM apairs GROUP BY q_id),
       |lvl AS (SELECT qs.q_id,
       |    CASE WHEN COALESCE(s.n0, 0) >= 5 THEN 0
       |         WHEN COALESCE(s.n1, 0) >= 5 THEN 1 ELSE 2 END AS l
       |  FROM qset qs LEFT JOIN astats s ON s.q_id = qs.q_id),
       |chosen AS (
       |  SELECT p.q_id, p.c_id FROM apairs p
       |    JOIN lvl ON lvl.q_id = p.q_id
       |    WHERE lvl.l < 2 AND p.min_dist <= lvl.l
       |  UNION ALL
       |  SELECT qs.q_id, f.vec_id AS c_id FROM qset qs
       |    JOIN lvl ON lvl.q_id = qs.q_id AND lvl.l = 2
       |    JOIN filt f ON f.vec_id <> qs.q_id),
       |px AS (SELECT cp.q_id, cp.c_id, unnest(a.embedding) AS x, unnest(bb.embedding) AS y
       |  FROM chosen cp JOIN embeddings a ON a.vec_id = cp.q_id
       |  JOIN embeddings bb ON bb.vec_id = cp.c_id),
       |ps AS (SELECT q_id, c_id,
       |  SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)) /
       |  (SQRT(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) * SQRT(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS s
       |  FROM px GROUP BY q_id, c_id),
       |rankeds AS (SELECT q_id, c_id, s,
       |  row_number() OVER (PARTITION BY q_id ORDER BY s DESC, c_id) AS rn FROM ps)
       |SELECT r.q_id, r.rn, r.c_id AS neighbor_id, ROUND(r.s, 4) + 0 AS score,
       |  CASE lvl.l WHEN 0 THEN 'lsh' WHEN 1 THEN 'lsh_mp1' ELSE 'brute' END AS index_used
       |FROM rankeds r JOIN lvl ON lvl.q_id = r.q_id
       |WHERE r.rn <= 5 ORDER BY r.q_id, r.rn""".stripMargin

  /** knn_filtered_ivf_adaptive: the IVF guaranteed-k ladder (r16 — the
    * LSH filtered policy expressed in IVF's own geometry) replayed
    * rule and all: cluster ranking for the query (cosine desc, cid),
    * per-row assignment (argmax cosine, first-max tie-break),
    * candidate counts at nprobe=2 and the doubled 2·nprobe=4 probe
    * lists (each ∩ the `vec_id % 47 = 0` filter), the first level with
    * ≥ k survivors (else the filtered corpus), exact-cosine rerank and
    * the reported level (`ivf`/`ivf_w2`/`brute`). Same CTE shapes as
    * ann_ivf. */
  private def knnFilteredIvfAdaptiveSql: String =
    s"""WITH $xxhCte,
       |$centsCte,
       |$corpusCte,
       |centv AS (SELECT c2.cid, e2.embedding AS ce FROM cents c2 JOIN corpus e2 ON e2.vec_id = c2.cid),
       |rcp AS (SELECT e.vec_id, c.cid, unnest(e.embedding) AS x, unnest(c.ce) AS y FROM corpus e, centv c),
       |rc AS (SELECT vec_id, cid,
       |    CASE WHEN SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)) = 0 OR SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)) = 0 THEN 0.0
       |         ELSE SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)) /
       |              (SQRT(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) * SQRT(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) END AS s
       |  FROM rcp GROUP BY vec_id, cid),
       |assigned AS (SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn FROM rc)
       |  WHERE rn = 1),
       |pranked AS (SELECT cid, row_number() OVER (ORDER BY s DESC, cid) AS prn FROM rc WHERE vec_id = 0),
       |filt AS (SELECT vec_id FROM corpus WHERE vec_id % 47 = 0),
       |icand AS (SELECT a.vec_id, CASE WHEN p.prn <= 2 THEN 0 ELSE 1 END AS d
       |  FROM assigned a JOIN pranked p ON p.cid = a.cid AND p.prn <= 4
       |  JOIN filt f ON f.vec_id = a.vec_id),
       |lvl AS (SELECT CASE WHEN (SELECT COUNT(*) FROM icand WHERE d = 0) >= 5 THEN 0
       |                    WHEN (SELECT COUNT(*) FROM icand) >= 5 THEN 1 ELSE 2 END AS l),
       |chosen AS (SELECT vec_id FROM icand WHERE (SELECT l FROM lvl) < 2 AND d <= (SELECT l FROM lvl)
       |  UNION ALL SELECT vec_id FROM filt WHERE (SELECT l FROM lvl) = 2),
       |$qScoresCtes
       |SELECT c.vec_id, ROUND(s.s, 4) AS score,
       |  CASE (SELECT l FROM lvl) WHEN 0 THEN 'ivf' WHEN 1 THEN 'ivf_w2' ELSE 'brute' END AS index_used
       |FROM chosen c JOIN scores s ON s.vec_id = c.vec_id
       |ORDER BY s.s DESC, c.vec_id LIMIT 5""".stripMargin

  /** knn_filtered_ivf_batched_rule: the IVF guaranteed-k ladder run
    * for all 5 requests at once (r17 — the batched twin of
    * knn_filtered_ivf_adaptive, exactly as
    * knn_filtered_adaptive_batched is the batched twin of
    * knn_filtered_adaptive). Per request: cluster ranking (cosine
    * desc, cid — the same rc CTE the per-request replay uses), the
    * widened top-4 probe list with its level tag (0 within nprobe=2,
    * 1 in the doubled tail), candidates from the per-row assignment ∩
    * the `vec_id % 23 = 0` filter, both survivor counts, the first
    * level with ≥ k survivors (starved requests → brute over the
    * filtered corpus), exact-cosine rerank of the chosen set and the
    * per-request `index_used` — self excluded throughout. */
  private def knnFilteredIvfBatchedSql: String =
    s"""WITH $xxhCte,
       |$centsCte,
       |$corpusCte,
       |centv AS (SELECT c2.cid, e2.embedding AS ce FROM cents c2 JOIN corpus e2 ON e2.vec_id = c2.cid),
       |rcp AS (SELECT e.vec_id, c.cid, unnest(e.embedding) AS x, unnest(c.ce) AS y FROM corpus e, centv c),
       |rc AS (SELECT vec_id, cid,
       |    CASE WHEN SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)) = 0 OR SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)) = 0 THEN 0.0
       |         ELSE SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)) /
       |              (SQRT(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) * SQRT(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) END AS s
       |  FROM rcp GROUP BY vec_id, cid),
       |assigned AS (SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn FROM rc)
       |  WHERE rn = 1),
       |qset AS (SELECT vec_id AS q_id FROM corpus WHERE vec_id < 5),
       |probeq AS (SELECT q_id, cid, CASE WHEN rn <= 2 THEN 0 ELSE 1 END AS d FROM (
       |    SELECT q.q_id, r.cid, row_number() OVER (PARTITION BY q.q_id ORDER BY r.s DESC, r.cid) AS rn
       |    FROM qset q JOIN rc r ON r.vec_id = q.q_id)
       |  WHERE rn <= 4),
       |filt AS (SELECT vec_id FROM corpus WHERE vec_id % 23 = 0),
       |ipairs AS (SELECT p.q_id, a.vec_id AS c_id, p.d
       |  FROM probeq p JOIN assigned a ON a.cid = p.cid AND a.vec_id <> p.q_id
       |  JOIN filt f ON f.vec_id = a.vec_id),
       |istats AS (SELECT q_id, SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS n0,
       |    COUNT(*) AS n1
       |  FROM ipairs GROUP BY q_id),
       |lvl AS (SELECT qs.q_id,
       |    CASE WHEN COALESCE(s.n0, 0) >= 5 THEN 0
       |         WHEN COALESCE(s.n1, 0) >= 5 THEN 1 ELSE 2 END AS l
       |  FROM qset qs LEFT JOIN istats s ON s.q_id = qs.q_id),
       |chosen AS (
       |  SELECT p.q_id, p.c_id FROM ipairs p
       |    JOIN lvl ON lvl.q_id = p.q_id
       |    WHERE lvl.l < 2 AND p.d <= lvl.l
       |  UNION ALL
       |  SELECT qs.q_id, f.vec_id AS c_id FROM qset qs
       |    JOIN lvl ON lvl.q_id = qs.q_id AND lvl.l = 2
       |    JOIN filt f ON f.vec_id <> qs.q_id),
       |px AS (SELECT cp.q_id, cp.c_id, unnest(a.embedding) AS x, unnest(bb.embedding) AS y
       |  FROM chosen cp JOIN corpus a ON a.vec_id = cp.q_id
       |  JOIN corpus bb ON bb.vec_id = cp.c_id),
       |ps AS (SELECT q_id, c_id,
       |  SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)) /
       |  (SQRT(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) * SQRT(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS s
       |  FROM px GROUP BY q_id, c_id),
       |rankeds AS (SELECT q_id, c_id, s,
       |  row_number() OVER (PARTITION BY q_id ORDER BY s DESC, c_id) AS rn FROM ps)
       |SELECT r.q_id, r.rn, r.c_id AS neighbor_id, ROUND(r.s, 4) + 0 AS score,
       |  CASE lvl.l WHEN 0 THEN 'ivf' WHEN 1 THEN 'ivf_w2' ELSE 'brute' END AS index_used
       |FROM rankeds r JOIN lvl ON lvl.q_id = r.q_id
       |WHERE r.rn <= 5 ORDER BY r.q_id, r.rn""".stripMargin

  /** knn_serve_stream_ivf: the 5-request serving stream answered from
    * the registered IVF layout. Assignment (argmax cosine vs the
    * stride-53 centroids, lowest-cid tie-break) is computed once; each
    * request probes ITS top-2 centroids and exact-reranks within them,
    * self excluded. Reuses ann_ivf's xxh/cents/assignment CTE shapes.
    */
  private def knnServeStreamIvfSql: String =
    s"""WITH $xxhCte,
       |$centsCte,
       |$corpusCte,
       |centv AS (SELECT c2.cid, e2.embedding AS ce FROM cents c2 JOIN corpus e2 ON e2.vec_id = c2.cid),
       |rcp AS (SELECT e.vec_id, c.cid, unnest(e.embedding) AS x, unnest(c.ce) AS y FROM corpus e, centv c),
       |rc AS (SELECT vec_id, cid,
       |    CASE WHEN SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)) = 0 OR SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)) = 0 THEN 0.0
       |         ELSE SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)) /
       |              (SQRT(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) * SQRT(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) END AS s
       |  FROM rcp GROUP BY vec_id, cid),
       |assigned AS (SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn FROM rc)
       |  WHERE rn = 1),
       |qset AS (SELECT vec_id AS q_id FROM corpus WHERE vec_id < 5),
       |probeq AS (SELECT q_id, cid FROM (
       |    SELECT q.q_id, r.cid, row_number() OVER (PARTITION BY q.q_id ORDER BY r.s DESC, r.cid) AS rn
       |    FROM qset q JOIN rc r ON r.vec_id = q.q_id)
       |  WHERE rn <= 2),
       |cpairs AS (SELECT DISTINCT p.q_id, a.vec_id AS c_id
       |  FROM probeq p JOIN assigned a ON a.cid = p.cid AND a.vec_id <> p.q_id),
       |px AS (SELECT cp.q_id, cp.c_id, unnest(a.embedding) AS x, unnest(bb.embedding) AS y
       |  FROM cpairs cp JOIN corpus a ON a.vec_id = cp.q_id
       |  JOIN corpus bb ON bb.vec_id = cp.c_id),
       |ps AS (SELECT q_id, c_id,
       |  SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)) /
       |  (SQRT(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) * SQRT(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS s
       |  FROM px GROUP BY q_id, c_id),
       |rankeds AS (SELECT q_id, c_id, s,
       |  row_number() OVER (PARTITION BY q_id ORDER BY s DESC, c_id) AS rn FROM ps)
       |SELECT q_id, rn, c_id AS neighbor_id, ROUND(s, 4) + 0 AS score
       |FROM rankeds WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin

  private def knnLshMultiprobeSql: String =
    s"""WITH $lshCtes,
       |cand AS (SELECT DISTINCT b.vec_id FROM buckets b JOIN qb ON qb.t = b.t
       |         WHERE bit_count(xor(qb.bkt::UBIGINT, b.bkt::UBIGINT)) <= 1)
       |SELECT c.vec_id, ROUND(s.s, 4) AS score
       |FROM cand c JOIN scores s ON s.vec_id = c.vec_id
       |ORDER BY s.s DESC, c.vec_id LIMIT 5""".stripMargin

  // ---- ann_sq -----------------------------------------------------
  // SqKnn: scales = max|normalized component| / 127 per dim; codes =
  // rint(u/scale) clamped to +/-127; score = sum(code_d * qn_d*scale_d).
  private def annSqSql: String = {
    val q = rint("CAST(v.x AS DOUBLE) / s.sc")
    s"""WITH $corpusCte,
       |$vnCtes,
       |scales AS (SELECT i, CAST(MAX(ABS(x)) AS DOUBLE) / 127.0 AS sc FROM vn GROUP BY i),
       |codes AS (SELECT v.vec_id, v.i,
       |    CASE WHEN s.sc = 0 THEN 0
       |         ELSE GREATEST(-127, LEAST(127, $q)) END AS code
       |  FROM vn v JOIN scales s ON s.i = v.i),
       |qs AS (SELECT v.i, CAST(v.x AS DOUBLE) * s.sc AS qsc
       |       FROM vn v JOIN scales s ON s.i = v.i WHERE v.vec_id = 0),
       |scores AS (SELECT c.vec_id, SUM(c.code * q.qsc) AS s
       |           FROM codes c JOIN qs q ON q.i = c.i GROUP BY c.vec_id)
       |SELECT vec_id, ROUND(s, 4) AS score FROM scores ORDER BY s DESC, vec_id LIMIT 5""".stripMargin
  }

  // ---- ann_ivf ----------------------------------------------------
  // IvfKnn(stride=53, nprobe=2): centroid sampling needs Spark's
  // xxhash64 of a BIGINT (XXH64 of the 8-byte value, seed 42) —
  // implemented below with the same HUGEINT machinery; assignment is
  // argmax cosine with first-max (ascending centroid id) tie-break,
  // probe = top-2 centroids by cosine to the query.
  /** Spark xxhash64 of a BIGINT vec_id (seed 42) in HUGEINT CTEs —
    * produces `xxh`(vec_id, h); shared by the IVF replays. */
  private def xxhCte: String = {
    val P1 = "11400714785074694791"
    val P2 = "14029467366897019727"
    val P3 = "1609587929392839161"
    val P4 = BigInt("9650029242287828579")
    // acc0 = (seed=42 + PRIME5 + len=8) mod 2^64
    val acc0 = (BigInt(42) + BigInt("2870177450012600261") + 8).mod(W64)
    s"""x1 AS (SELECT vec_id, (${mul64(rotl(mul64("vec_id::HUGEINT", P2), 31), P1)})::HUGEINT AS k1
       |       FROM (SELECT DISTINCT vec_id FROM embeddings WHERE embedding IS NOT NULL)),
       |x2 AS (SELECT vec_id, xor($acc0::HUGEINT, k1)::HUGEINT AS acc FROM x1),
       |x3 AS (SELECT vec_id, ((${mul64(rotl("acc", 27), P1)} + $P4) % $W64)::HUGEINT AS acc FROM x2),
       |x4 AS (SELECT vec_id, (${mul64("xor(acc, (acc // 8589934592)::HUGEINT)::HUGEINT", P2)})::HUGEINT AS acc FROM x3),
       |x5 AS (SELECT vec_id, (${mul64("xor(acc, (acc // 536870912)::HUGEINT)::HUGEINT", P3)})::HUGEINT AS acc FROM x4),
       |xxh AS (SELECT vec_id, xor(acc, (acc // $W32)::HUGEINT)::HUGEINT AS h FROM x5)""".stripMargin
  }

  /** stride-53 centroid sampling off `xxh` (signed floorMod, as the
    * engine's `xxhash64 % stride`): `cents`(cid). */
  private val centsCte =
    s"""cents AS (SELECT vec_id AS cid FROM xxh
       |          WHERE ((((h - CASE WHEN h >= 9223372036854775808 THEN $W64::HUGEINT ELSE 0::HUGEINT END) % 53) + 53) % 53) = 0
       |          ORDER BY cid LIMIT 4096)""".stripMargin

  private def annIvfSql: String = {
    s"""WITH $xxhCte,
       |$centsCte,
       |$corpusCte,
       |centv AS (SELECT c2.cid, e2.embedding AS ce FROM cents c2 JOIN corpus e2 ON e2.vec_id = c2.cid),
       |rcp AS (SELECT e.vec_id, c.cid, unnest(e.embedding) AS x, unnest(c.ce) AS y FROM corpus e, centv c),
       |rc AS (SELECT vec_id, cid,
       |    CASE WHEN SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)) = 0 OR SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)) = 0 THEN 0.0
       |         ELSE SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)) /
       |              (SQRT(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) * SQRT(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) END AS s
       |  FROM rcp GROUP BY vec_id, cid),
       |assigned AS (SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn FROM rc)
       |  WHERE rn = 1),
       |probe AS (SELECT cid FROM (
       |    SELECT cid, row_number() OVER (ORDER BY s DESC, cid) AS rn FROM rc WHERE vec_id = 0)
       |  WHERE rn <= 2),
       |$qScoresCtes
       |SELECT a.vec_id, ROUND(s.s, 4) AS score
       |FROM assigned a JOIN probe p ON p.cid = a.cid JOIN scores s ON s.vec_id = a.vec_id
       |ORDER BY s.s DESC, a.vec_id LIMIT 5""".stripMargin
  }

  // ---- ann_lsh_rule_clustered -------------------------------------
  // The decision table's CONTINUOUS-INGEST row (LSH 8×12 + 1-bit
  // multi-probe) on the same clustered fixture as the IVF gate: full
  // plane/bucket replay over read_parquet of the staged fixture,
  // Hamming-ball candidates, exact rerank.
  private def annLshRuleClusteredSql: String = {
    // path built from the SAME versioned constant the engine stages to
    // (r14 ADVICE: a generator change bumps the version, so the oracle
    // can never replay stale fixture bytes the engine no longer serves)
    val fix = new java.io.File(Queries.clusteredFixtureRelPath).getAbsolutePath
    s"""WITH ${lshCtesOver(s"read_parquet('$fix/*.parquet')")},
       |cand AS (SELECT DISTINCT b.vec_id FROM buckets b JOIN qb ON qb.t = b.t
       |         WHERE bit_count(xor(qb.bkt::UBIGINT, b.bkt::UBIGINT)) <= 1)
       |SELECT c.vec_id, ROUND(s.s, 4) AS score
       |FROM cand c JOIN scores s ON s.vec_id = c.vec_id
       |ORDER BY s.s DESC, c.vec_id LIMIT 10""".stripMargin
  }

  // ---- ann_ivf_rule_clustered -------------------------------------
  // The clustered-fixture serving gate: corpus = the staged
  // mixture-of-Gaussians parquet (written once by the engine to a
  // stable path; the oracle replays from the SAME bytes — floats are
  // never regenerated in SQL), centroids = `vec_id % 61 = 0` (pure
  // arithmetic, no inlined constants), probe = top-4 centroids by
  // cosine to query vec 0, assignment = argmax cosine with
  // first-max (ascending centroid id) tie-break, rerank = exact
  // cosine. Same CTE shapes as ann_ivf.
  private def annIvfRuleClusteredSql: String = {
    // same versioned-constant path as the engine's staging (see
    // annLshRuleClusteredSql)
    val fix = new java.io.File(Queries.clusteredFixtureRelPath).getAbsolutePath
    s"""WITH corpus AS (SELECT vec_id, embedding
       |    FROM read_parquet('$fix/*.parquet') WHERE embedding IS NOT NULL),
       |cents AS (SELECT vec_id AS cid FROM corpus WHERE vec_id % 61 = 0),
       |centv AS (SELECT c2.cid, e2.embedding AS ce FROM cents c2 JOIN corpus e2 ON e2.vec_id = c2.cid),
       |rcp AS (SELECT e.vec_id, c.cid, unnest(e.embedding) AS x, unnest(c.ce) AS y FROM corpus e, centv c),
       |rc AS (SELECT vec_id, cid,
       |    CASE WHEN SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)) = 0 OR SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)) = 0 THEN 0.0
       |         ELSE SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)) /
       |              (SQRT(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) * SQRT(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) END AS s
       |  FROM rcp GROUP BY vec_id, cid),
       |assigned AS (SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn FROM rc)
       |  WHERE rn = 1),
       |probe AS (SELECT cid FROM (
       |    SELECT cid, row_number() OVER (ORDER BY s DESC, cid) AS rn FROM rc WHERE vec_id = 0)
       |  WHERE rn <= 4),
       |qpairs AS (SELECT e.vec_id, unnest(e.embedding) AS x, unnest(q.qe) AS y
       |           FROM corpus e, (SELECT embedding AS qe FROM corpus WHERE vec_id = 0) q),
       |scores AS (SELECT vec_id,
       |    SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)) /
       |    (SQRT(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) * SQRT(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS s
       |  FROM qpairs GROUP BY vec_id)
       |SELECT a.vec_id, ROUND(s.s, 4) AS score
       |FROM assigned a JOIN probe p ON p.cid = a.cid JOIN scores s ON s.vec_id = a.vec_id
       |ORDER BY s.s DESC, a.vec_id LIMIT 10""".stripMargin
  }

  // ---- ann_recall / ann_recall_exact ------------------------------
  // Full SQL replay of the recall harness
  // (AnnEval.recallSinglePass with lsh(8,6,42)/mp1, ivf stride-53
  // nprobe-4, sq8; k=10, queries = corpus members vec_id % 25 == 0):
  // per-query per-method top-10 candidates ranked by the method's own
  // score, intersected with the brute top-10, averaged to the same
  // rounded (avg_recall, min_recall) table. Reuses the proven plane /
  // xxhash / scale CTE shapes of knn_lsh, ann_ivf and ann_sq,
  // generalized from the single vec-0 query to the 20-query set.
  //
  // With `withPq`, the PQ method is replayed too: the k-means codebook
  // is not recomputable in SQL, but it does not need to be — Verify
  // inlines the TRAINED codebook (the same driver-side floats the
  // engine broadcasts) via [[pqCodebookCte]] into the
  // `__PQ_CODEBOOK_CTE__` placeholder, the constants-inlined pattern
  // the LSH plane matrix already uses. DuckDB then replays encode
  // (per sub-space argmin L2 over the inlined centroids, first-min
  // tie-break = lowest code) and ADC scoring (per-query dot table,
  // summed over sub-spaces) from the stored constants.
  private def annRecallExactSql: String = recallHarnessSql(withPq = false)
  private def annRecallSql: String = recallHarnessSql(withPq = true)

  /** The `pqcb`(s, c, si, x) CTE for a TRAINED codebook — generated at
    * Verify time (training needs Spark + the corpus; the SQL map is
    * static) and substituted into [[annRecallSql]]'s placeholder.
    * Floats print via Float.toString and round-trip through
    * CAST(w AS FLOAT), the same exactness trick as the plane matrix.
    */
  /** cluster_balance's trained k-means centroids as a `kc(cid, i, c)`
    * CTE (1-based component index, matching `generate_subscripts`) —
    * inlined by Verify into `__KMEANS_CENTROIDS_CTE__`, the same
    * constants pattern as [[pqCodebookCte]]. Doubles print in Scala's
    * shortest round-trip form, which DuckDB parses back bit-exactly.
    */
  def kmeansCentroidsCte(centers: Array[Array[Double]]): String = {
    val dim = centers.head.length
    val flat = centers.flatten
    val lit = flat.mkString("[", ",", "]")
    s"""kc AS (SELECT f // $dim AS cid, (f % $dim)::BIGINT + 1 AS i, CAST(w AS DOUBLE) AS c
       |       FROM (SELECT unnest($lit) AS w, unnest(range(0, ${flat.length})) AS f))""".stripMargin
  }

  // ---- ann_hnsw_walk ----------------------------------------------
  // Replay of graft.index.HnswWalk over the PERSISTED HnswIndexStore
  // adjacency: Verify inlines the examined neighbor lists — the rows
  // the stored graph actually served to the walk — as VALUES into
  // __HNSW_WALK_ADJ__ (the kmeans-centroids trust model: the trained /
  // built artifact is input, every DECISION is re-made here). The
  // recursive CTE starts at the stored entry point (node_idx 0 = the
  // smallest held-in vec_id), takes the argmax-cosine neighbor of the
  // current node on the current layer (ties to the smaller id), moves
  // if it beats the current node (strictly, or equal-score smaller
  // id), else descends one layer carrying the node, and stops at
  // layer 0 with no improvement. Cosines are recomputed from the
  // embeddings table with the same index-ordered unnest sums as the
  // knn oracles — bit-identical doubles, so the strict comparisons the
  // walk branches on agree with the engine's. A buggy engine walk
  // diverges here, hits adjacency the CTE does not carry, and the
  // traces mismatch: disagreement is always visible. 4 = Hnsw.MaxLevel.

  def hnswWalkAdjValues(rows: Seq[index.HnswWalk.WalkRow]): String = {
    val triples = rows
      .flatMap(r => r.nb_ids.map(nb => (r.node_id, r.layer, nb)))
      .distinct.sorted
    if (triples.isEmpty)
      // a graph can only serve an empty neighbor list if every layer of
      // every visited node is edgeless; keep the CTE well-formed — the
      // NULL row joins nothing, so the replay walk just descends
      "VALUES (CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT))"
    else triples
      .map { case (n, l, b) => s"($n::BIGINT, $l::BIGINT, $b::BIGINT)" }
      .mkString("VALUES ", ", ", "")
  }

  private val annHnswWalkSql =
    """WITH RECURSIVE
      |adj(node_id, layer, nb_id) AS (__HNSW_WALK_ADJ__),
      |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      |entry AS (SELECT MIN(vec_id) AS vid FROM embeddings
      |          WHERE vec_id <> 0 AND embedding IS NOT NULL),
      |nodes AS (SELECT node_id AS vid FROM adj UNION SELECT nb_id FROM adj
      |          UNION SELECT vid FROM entry),
      |pairs AS (SELECT e.vec_id, unnest(e.embedding) AS x, unnest(q.qe) AS y
      |          FROM embeddings e, q WHERE e.vec_id IN (SELECT vid FROM nodes)),
      |sc AS (SELECT vec_id,
      |         SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)) /
      |         (SQRT(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) * SQRT(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS s
      |       FROM pairs GROUP BY vec_id),
      |best AS (SELECT node_id, layer, nb_id, s FROM (
      |           SELECT a.node_id, a.layer, a.nb_id, sc.s,
      |             row_number() OVER (PARTITION BY a.node_id, a.layer
      |                                ORDER BY sc.s DESC, a.nb_id) AS rn
      |           FROM adj a JOIN sc ON sc.vec_id = a.nb_id) WHERE rn = 1),
      |walk(step, layer, node, s) AS (
      |  SELECT CAST(0 AS BIGINT), CAST(4 AS BIGINT), e.vid, sc.s
      |  FROM entry e JOIN sc ON sc.vec_id = e.vid
      |  UNION ALL
      |  SELECT w.step + 1,
      |    CASE WHEN b.s > w.s OR (b.s = w.s AND b.nb_id < w.node)
      |         THEN w.layer ELSE w.layer - 1 END,
      |    CASE WHEN b.s > w.s OR (b.s = w.s AND b.nb_id < w.node)
      |         THEN b.nb_id ELSE w.node END,
      |    CASE WHEN b.s > w.s OR (b.s = w.s AND b.nb_id < w.node)
      |         THEN b.s ELSE w.s END
      |  FROM walk w LEFT JOIN best b ON b.node_id = w.node AND b.layer = w.layer
      |  WHERE w.layer > 0
      |     OR (b.s IS NOT NULL AND (b.s > w.s OR (b.s = w.s AND b.nb_id < w.node)))
      |)
      |SELECT step, layer, node AS node_id, ROUND(s, 4) AS score
      |FROM walk ORDER BY step""".stripMargin

  // ---- cluster_balance --------------------------------------------
  // TrainingOps.clusterBalance over the inlined trained centroids:
  // argmin squared-L2 over RAW (un-normalized) components with the
  // engine's (dist, cid) struct-min first-min tie-break, uniform
  // target total//8, integer floor-div percent rate clamped at 100,
  // keep iff re-signed splitmix64(vec_id) floorMod 100 < rate.
  /** Shared argmin-L2 assignment replay off the inlined `kc` CTE:
    * RAW (un-normalized) components, first-min (lowest cid) tie-break
    * — `comps`/`dist`/`asg`. One definition serves cluster_balance
    * AND dedup_semantic so the two oracles can never disagree on
    * cluster membership.
    */
  private val assignCtes =
    s"""comps AS (SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1)::BIGINT AS i FROM corpus),
       |dist AS (SELECT v.vec_id, k.cid,
       |    SUM((CAST(v.x AS DOUBLE) - k.c) * (CAST(v.x AS DOUBLE) - k.c)) AS d
       |  FROM comps v JOIN kc k ON k.i = v.i GROUP BY v.vec_id, k.cid),
       |asg AS (SELECT vec_id, cid AS cluster_id FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM dist)
       |  WHERE rn = 1)""".stripMargin

  private def clusterBalanceSql: String =
    s"""WITH __KMEANS_CENTROIDS_CTE__,
       |$corpusCte,
       |$assignCtes,
       |sizes AS (SELECT cluster_id, count(*) AS n_vecs FROM asg GROUP BY cluster_id),
       |-- k derives from the inlined CTE itself, so the oracle tracks
       |-- whatever centroid count Verify substitutes (never a stale
       |-- literal coupled to the engine's k)
       |tot AS (SELECT SUM(n_vecs) AS total, (SELECT max(cid) + 1 FROM kc) AS k FROM sizes),
       |rates AS (SELECT cluster_id, n_vecs,
       |    CAST(LEAST(100, (100 * (total // k)) // n_vecs) AS BIGINT) AS rate_pct
       |  FROM sizes CROSS JOIN tot),
       |h0 AS (SELECT vec_id, cluster_id, (${smix("vec_id::HUGEINT")})::HUGEINT AS h FROM asg),
       |k AS (SELECT vec_id, cluster_id,
       |    ((((h - CASE WHEN h >= 9223372036854775808 THEN $W64::HUGEINT ELSE 0::HUGEINT END) % 100) + 100) % 100) AS bucket
       |  FROM h0)
       |SELECT r.cluster_id, r.n_vecs, r.rate_pct,
       |  CAST(SUM(CASE WHEN k.bucket < r.rate_pct THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN k.bucket < r.rate_pct THEN k.vec_id ELSE 0 END) AS BIGINT) AS kept_id_sum
       |FROM k JOIN rates r USING (cluster_id)
       |GROUP BY r.cluster_id, r.n_vecs, r.rate_pct
       |ORDER BY r.cluster_id""".stripMargin

  // ---- dedup_semantic ---------------------------------------------
  // TrainingOps.semDedup(maxBlock=64) off the same inlined centroids:
  // argmin-L2 assignment (identical CTEs to cluster_balance), then the
  // skew bound — clusters split into nb = ceil(n/64) sub-blocks by
  // floorMod(splitmix64(vec_id), nb) (re-signed HUGEINT splitmix, the
  // cluster_balance bucket pattern), a pair compared iff its block
  // distance mod nb is in {0, 1, nb-1} — then id_a < id_b pairing,
  // raw-cosine threshold, 4-dp output round. The adjacency predicate
  // is replayed directly on the naive join (DuckDB doesn't need the
  // engine's explode-key plan, only its semantics).
  private def dedupSemanticSql: String =
    s"""WITH __KMEANS_CENTROIDS_CTE__,
       |$corpusCte,
       |$assignCtes,
       |nbs AS (SELECT cluster_id, (count(*) + 63) // 64 AS nb FROM asg GROUP BY cluster_id),
       |bh AS (SELECT vec_id, cluster_id, (${smix("vec_id::HUGEINT")})::HUGEINT AS h FROM asg),
       |blk AS (SELECT vec_id, cluster_id, nb,
       |    ((((h - CASE WHEN h >= 9223372036854775808 THEN $W64::HUGEINT ELSE 0::HUGEINT END) % nb) + nb) % nb) AS block
       |  FROM bh JOIN nbs USING (cluster_id)),
       |pv AS (SELECT a.cluster_id, a.vec_id AS ia, b.vec_id AS ib
       |       FROM blk a JOIN blk b ON b.cluster_id = a.cluster_id AND a.vec_id < b.vec_id
       |        AND ((((a.block - b.block) % a.nb) + a.nb) % a.nb) IN (0, 1, a.nb - 1)),
       |pu AS (SELECT p.cluster_id, p.ia, p.ib, ca.x AS xa, cb.x AS xb
       |       FROM pv p JOIN comps ca ON ca.vec_id = p.ia JOIN comps cb ON cb.vec_id = p.ib AND cb.i = ca.i),
       |cs AS (SELECT cluster_id, ia, ib,
       |    CASE WHEN SUM(CAST(xa AS DOUBLE)*CAST(xa AS DOUBLE)) = 0 OR SUM(CAST(xb AS DOUBLE)*CAST(xb AS DOUBLE)) = 0 THEN 0.0
       |         ELSE SUM(CAST(xa AS DOUBLE)*CAST(xb AS DOUBLE)) /
       |              (SQRT(SUM(CAST(xa AS DOUBLE)*CAST(xa AS DOUBLE))) * SQRT(SUM(CAST(xb AS DOUBLE)*CAST(xb AS DOUBLE)))) END AS cos
       |  FROM pu GROUP BY cluster_id, ia, ib)
       |SELECT cluster_id, ia AS id_a, ib AS id_b, ROUND(cos, 4) AS cos
       |FROM cs WHERE cos >= 0.4 ORDER BY id_a, id_b""".stripMargin

  def pqCodebookCte(cb: index.PqKnn.Codebooks): String = {
    val parts = cb.cents.indices.map { s =>
      val flat = cb.cents(s).flatten
      val lit = flat.mkString("[", ",", "]")
      s"""SELECT $s AS s, f // ${cb.subDim} AS c, (f % ${cb.subDim})::BIGINT AS si,
         |      CAST(w AS FLOAT) AS x
         |    FROM (SELECT unnest($lit) AS w, unnest(range(0, ${flat.length})) AS f)""".stripMargin
    }
    s"pqcb AS (${parts.mkString("\n  UNION ALL\n  ")})"
  }

  private def recallHarnessSql(withPq: Boolean): String = {
    val lsh = index.RandomHyperplaneLsh(8, 6, 42L)
    val flat = lsh.planes(64).flatten.flatten
    val flatLit = flat.mkString("[", ",", "]")
    val cosSum =
      """CASE WHEN SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)) = 0 OR SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)) = 0 THEN 0.0
        |         ELSE SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)) /
        |              (SQRT(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) * SQRT(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) END""".stripMargin
    def candTopK(name: String, cand: String) =
      s"""${name}_k AS (SELECT '$name' AS method, qid, id FROM (
         |    SELECT c.qid, c.id, row_number() OVER (PARTITION BY c.qid ORDER BY s.s DESC, c.id) AS rn
         |    FROM $cand c JOIN qscores s ON s.id = c.id AND s.qid = c.qid) WHERE rn <= 10)""".stripMargin
    // PQ replay off the inlined codebook: vn's 1-based component index
    // splits into (sub-space s, within-sub si); encode = per (vec, s)
    // the argmin-L2 code (ORDER BY d, c == the engine's strict-< first-
    // min); ADC = per (qid, s, c) dot of the query's normalized sub-
    // vector with the centroid, summed over the vector's 8 codes.
    val pqCtes = if (!withPq) "" else
      s"""|__PQ_CODEBOOK_CTE__,
         |-- sub-space width derives from the inlined codebook itself
         |-- (max within-sub index + 1), so the replay tracks whatever
         |-- m/dim the substituted Codebooks were trained with
         |pqw AS (SELECT max(si) + 1 AS w FROM pqcb),
         |pqsub AS (SELECT vec_id, (i - 1) // w AS s, (i - 1) % w AS si, CAST(x AS DOUBLE) AS x FROM vn CROSS JOIN pqw),
         |pqdist AS (SELECT v.vec_id, v.s, cb.c,
         |    SUM((v.x - CAST(cb.x AS DOUBLE)) * (v.x - CAST(cb.x AS DOUBLE))) AS d
         |  FROM pqsub v JOIN pqcb cb ON cb.s = v.s AND cb.si = v.si
         |  GROUP BY v.vec_id, v.s, cb.c),
         |pqcode AS MATERIALIZED (SELECT vec_id, s, c FROM (
         |    SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, c ASC) AS rn
         |    FROM pqdist) WHERE rn = 1),
         |pqadc AS (SELECT q.qid, cb.s, cb.c, SUM(v.x * CAST(cb.x AS DOUBLE)) AS t
         |  FROM qset q JOIN pqsub v ON v.vec_id = q.qid
         |  JOIN pqcb cb ON cb.s = v.s AND cb.si = v.si
         |  GROUP BY q.qid, cb.s, cb.c),
         |pq_scores AS (SELECT co.vec_id AS id, a.qid, SUM(a.t) AS s
         |  FROM pqcode co JOIN pqadc a ON a.s = co.s AND a.c = co.c
         |  GROUP BY 1, 2),
         |pq_k AS (SELECT 'pq' AS method, qid, id FROM (
         |    SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY s DESC, id) AS rn FROM pq_scores)
         |  WHERE rn <= 10),
         |""".stripMargin.stripPrefix("|")
    val pqUnion = if (withPq) " UNION ALL SELECT * FROM pq_k" else ""
    val methodsLit =
      if (withPq) "['ivf','lsh','lsh_mp','pq','sq']" else "['ivf','lsh','lsh_mp','sq']"
    s"""WITH $xxhCte,
       |$centsCte,
       |plvals AS (SELECT unnest($flatLit) AS w, unnest(range(0, ${flat.length})) AS f),
       |planes AS (SELECT f // 384 AS t, (f // 64) % 6 AS p, (f % 64)::BIGINT + 1 AS i, CAST(w AS FLOAT) AS w FROM plvals),
       |$corpusCte,
       |$vnCtes,
       |qset AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id % 25 = 0 ORDER BY vec_id LIMIT 20),
       |qpairs AS (SELECT e.vec_id AS id, q.qid, unnest(e.embedding) AS x, unnest(eq.embedding) AS y
       |           FROM corpus e CROSS JOIN qset q JOIN corpus eq ON eq.vec_id = q.qid),
       |qscores AS MATERIALIZED (SELECT id, qid, $cosSum AS s FROM qpairs GROUP BY id, qid),
       |truth_k AS (SELECT qid, id FROM (
       |    SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY s DESC, id) AS rn FROM qscores)
       |  WHERE rn <= 10),
       |dots AS (SELECT v.vec_id, pl.t, pl.p, SUM(CAST(v.x AS DOUBLE) * CAST(pl.w AS DOUBLE)) AS d
       |         FROM vn v JOIN planes pl ON pl.i = v.i GROUP BY v.vec_id, pl.t, pl.p),
       |buckets AS MATERIALIZED (SELECT vec_id, t, SUM(CASE WHEN d >= 0 THEN 1 << p ELSE 0 END)::BIGINT AS bkt
       |            FROM dots GROUP BY vec_id, t),
       |qb AS (SELECT q.qid, b.t, b.bkt FROM qset q JOIN buckets b ON b.vec_id = q.qid),
       |lsh_cand AS (SELECT DISTINCT b.vec_id AS id, qb.qid FROM buckets b JOIN qb ON qb.t = b.t AND qb.bkt = b.bkt),
       |lsh_mp_cand AS (SELECT DISTINCT b.vec_id AS id, qb.qid FROM buckets b JOIN qb ON qb.t = b.t
       |               WHERE bit_count(xor(qb.bkt::UBIGINT, b.bkt::UBIGINT)) <= 1),
       |centv AS (SELECT c2.cid, e2.embedding AS ce FROM cents c2 JOIN corpus e2 ON e2.vec_id = c2.cid),
       |rcp AS (SELECT e.vec_id, c.cid, unnest(e.embedding) AS x, unnest(c.ce) AS y FROM corpus e, centv c),
       |rc AS MATERIALIZED (SELECT vec_id, cid, $cosSum AS s FROM rcp GROUP BY vec_id, cid),
       |assigned AS (SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn FROM rc)
       |  WHERE rn = 1),
       |probe AS (SELECT qid, cid FROM (
       |    SELECT q.qid, rc.cid, row_number() OVER (PARTITION BY q.qid ORDER BY rc.s DESC, rc.cid) AS rn
       |    FROM qset q JOIN rc ON rc.vec_id = q.qid) WHERE rn <= 4),
       |ivf_cand AS (SELECT a.vec_id AS id, p.qid FROM assigned a JOIN probe p ON p.cid = a.cid),
       |scales AS (SELECT i, CAST(MAX(ABS(x)) AS DOUBLE) / 127.0 AS sc FROM vn GROUP BY i),
       |codes AS MATERIALIZED (SELECT v.vec_id, v.i,
       |    CASE WHEN s.sc = 0 THEN 0
       |         ELSE GREATEST(-127, LEAST(127, ${rint("CAST(v.x AS DOUBLE) / s.sc")})) END AS code
       |  FROM vn v JOIN scales s ON s.i = v.i),
       |qsq AS (SELECT q.qid, v.i, CAST(v.x AS DOUBLE) * s.sc AS qsc
       |        FROM qset q JOIN vn v ON v.vec_id = q.qid JOIN scales s ON s.i = v.i),
       |sq_scores AS (SELECT c.vec_id AS id, q.qid, SUM(c.code * q.qsc) AS s
       |              FROM codes c JOIN qsq q ON q.i = c.i GROUP BY 1, 2),
       |${candTopK("lsh", "lsh_cand")},
       |${candTopK("lsh_mp", "lsh_mp_cand")},
       |${candTopK("ivf", "ivf_cand")},
       |sq_k AS (SELECT 'sq' AS method, qid, id FROM (
       |    SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY s DESC, id) AS rn FROM sq_scores)
       |  WHERE rn <= 10),
       |${pqCtes}allm AS (SELECT * FROM lsh_k UNION ALL SELECT * FROM lsh_mp_k
       |         UNION ALL SELECT * FROM ivf_k UNION ALL SELECT * FROM sq_k$pqUnion),
       |hits AS (SELECT m.method, m.qid, count(*) / 10.0 AS recall
       |         FROM allm m JOIN truth_k t ON t.qid = m.qid AND t.id = m.id GROUP BY m.method, m.qid),
       |grid AS (SELECT m.method, q.qid
       |         FROM (SELECT unnest($methodsLit) AS method) m CROSS JOIN qset q),
       |per AS (SELECT g.method, g.qid, COALESCE(h.recall, 0.0) AS recall
       |        FROM grid g LEFT JOIN hits h ON h.method = g.method AND h.qid = g.qid)
       |SELECT method, 10 AS k, count(*) AS n_queries,
       |  ROUND(AVG(recall), 4) AS avg_recall, ROUND(MIN(recall), 4) AS min_recall
       |FROM per GROUP BY method ORDER BY method""".stripMargin
  }

  // ---- sample_stratified ------------------------------------------
  // TextFunctions.samplingBucket(100): splitmix64 of doc_id, then
  // floorMod of the SIGNED value by 100 (the engine's Long % with
  // negative correction) — the unsigned smix result is re-signed
  // before the mod, same pattern as the IVF centroid sampler above.
  private def sampleStratifiedSql: String =
    s"""WITH h0 AS (SELECT doc_id, lang, (${smix("doc_id::HUGEINT")})::HUGEINT AS h FROM documents),
       |b AS (SELECT doc_id, lang,
       |    ((((h - CASE WHEN h >= 9223372036854775808 THEN $W64::HUGEINT ELSE 0::HUGEINT END) % 100) + 100) % 100) AS bucket
       |  FROM h0),
       |k AS (SELECT lang, doc_id,
       |    CASE WHEN bucket < CASE WHEN lang = 'en' THEN 25 ELSE 75 END THEN 1 ELSE 0 END AS kept
       |  FROM b)
       |SELECT lang, count(*) AS n_docs, CAST(SUM(kept) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN kept = 1 THEN doc_id END) AS BIGINT) AS kept_id_sum,
       |  ROUND(SUM(kept) / CAST(count(*) AS DOUBLE), 4) AS kept_rate
       |FROM k GROUP BY lang ORDER BY lang""".stripMargin

  // ---- embedding_rp -----------------------------------------------
  // VectorFunctions.randomProject(16): matrix entry (i,j) regenerated
  // from floorMod(splitmix64(j*64+i), 6) (signed floorMod — re-sign
  // the unsigned smix first): 0 → +1, 1 → −1, else 0; scale
  // sqrt(3/16). The ratio of projected to original L2 norm is
  // re-derived entry-by-entry.
  private def embeddingRpSql: String =
    s"""WITH x AS (SELECT vec_id, label,
       |    generate_subscripts(embedding, 1) - 1 AS i, unnest(embedding) AS xi
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |jj AS (SELECT unnest(range(0, 16)) AS j),
       |rh AS (SELECT x.vec_id, x.label, x.xi, jj.j,
       |    (${smix("(jj.j*64 + x.i)::HUGEINT")})::HUGEINT AS h
       |  FROM x CROSS JOIN jj),
       |rv AS (SELECT vec_id, label, xi, j,
       |    ((((h - CASE WHEN h >= 9223372036854775808 THEN $W64::HUGEINT ELSE 0::HUGEINT END) % 6) + 6) % 6) AS r
       |  FROM rh),
       |y AS (SELECT vec_id, label, j,
       |    SUM(CASE WHEN r = 0 THEN CAST(xi AS DOUBLE)
       |             WHEN r = 1 THEN -CAST(xi AS DOUBLE) ELSE 0.0 END) * SQRT(3.0/16) AS yj
       |  FROM rv GROUP BY 1, 2, 3),
       |ny AS (SELECT vec_id, label, SQRT(SUM(yj*yj)) AS n_y FROM y GROUP BY 1, 2),
       |nx AS (SELECT vec_id, SQRT(SUM(CAST(xi AS DOUBLE)*CAST(xi AS DOUBLE))) AS n_x
       |  FROM x GROUP BY 1)
       |SELECT ny.vec_id, ny.label,
       |  ROUND(CASE WHEN nx.n_x = 0 THEN 0.0 ELSE ny.n_y / nx.n_x END, 4) + 0 AS norm_ratio
       |FROM ny JOIN nx USING (vec_id) ORDER BY vec_id""".stripMargin

  // ---- mix_temperature --------------------------------------------
  // TrainingOps.temperatureKept (α = 0.5): keep_e4 =
  // floor(sqrt(n_min/n_i)·10⁴) — sqrt is IEEE-correctly-rounded on
  // both engines so the rate is bit-exact; keeps via re-signed
  // splitmix64 floorMod 10⁴ (the sample_stratified pattern).
  private def mixTemperatureSql: String =
    s"""WITH per AS (SELECT lang, count(*)::BIGINT AS n_rows FROM documents GROUP BY 1),
       |mn AS (SELECT CAST(min(n_rows) AS DOUBLE) AS m FROM per),
       |r AS (SELECT lang, n_rows,
       |    CAST(floor(sqrt((SELECT m FROM mn) / CAST(n_rows AS DOUBLE)) * 10000) AS BIGINT) AS keep_e4
       |  FROM per),
       |h0 AS (SELECT doc_id, lang, (${smix("doc_id::HUGEINT")})::HUGEINT AS h FROM documents),
       |b AS (SELECT doc_id, lang,
       |    ((((h - CASE WHEN h >= 9223372036854775808 THEN $W64::HUGEINT ELSE 0::HUGEINT END) % 10000) + 10000) % 10000) AS bucket
       |  FROM h0)
       |SELECT r.lang AS lang, r.n_rows, r.keep_e4,
       |  count(*) FILTER (WHERE b.bucket < r.keep_e4) AS n_kept,
       |  CAST(SUM(doc_id) FILTER (WHERE b.bucket < r.keep_e4) AS BIGINT) AS kept_id_sum
       |FROM b JOIN r ON b.lang = r.lang
       |GROUP BY r.lang, r.n_rows, r.keep_e4 ORDER BY r.lang""".stripMargin

  // ---- quota_by_source --------------------------------------------
  // TrainingOps.quotaKept(source, 10): priority = the SIGNED
  // splitmix64(doc_id) (same re-sign as sample_stratified), rank by
  // (priority, doc_id) within source, keep rank <= 10. head_id pins
  // the order itself; kept_id_sum the membership.
  private def quotaBySourceSql: String =
    s"""WITH h0 AS (SELECT doc_id, source, (${smix("doc_id::HUGEINT")})::HUGEINT AS h FROM documents),
       |s AS (SELECT doc_id, source,
       |    (h - CASE WHEN h >= 9223372036854775808 THEN $W64::HUGEINT ELSE 0::HUGEINT END) AS qkey
       |  FROM h0),
       |r AS (SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source ORDER BY qkey, doc_id) AS rn
       |  FROM s)
       |SELECT source, count(*) AS n_kept,
       |  CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum,
       |  CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS head_id
       |FROM r WHERE rn <= 10 GROUP BY source ORDER BY source""".stripMargin

  // ---- shuffle_shard ----------------------------------------------
  // TrainingOps.shuffleShard: shard = floorMod(splitmix64(doc_id), 16)
  // (the engine's pmod over the SIGNED long — the unsigned smix result
  // is re-signed first, same pattern as sample_stratified), position =
  // dense 0-based rank by (skey, doc_id) within the shard. The
  // position-weighted checksum replays the ORDER, not just membership.
  private def shuffleShardSql: String =
    s"""WITH h0 AS (SELECT doc_id, (${smix("doc_id::HUGEINT")})::HUGEINT AS h FROM documents),
       |s AS (SELECT doc_id,
       |    (h - CASE WHEN h >= 9223372036854775808 THEN $W64::HUGEINT ELSE 0::HUGEINT END) AS skey
       |  FROM h0),
       |p AS (SELECT doc_id, skey,
       |    (((skey % 16) + 16) % 16) AS shard,
       |    row_number() OVER (PARTITION BY (((skey % 16) + 16) % 16)
       |                       ORDER BY skey, doc_id) - 1 AS pos
       |  FROM s)
       |SELECT CAST(shard AS BIGINT) AS shard, count(*) AS n_docs,
       |  CAST(MAX(CASE WHEN pos = 0 THEN doc_id END) AS BIGINT) AS head_id,
       |  CAST(SUM((pos + 1) * doc_id) AS BIGINT) AS ord_checksum
       |FROM p GROUP BY shard ORDER BY shard""".stripMargin

  // ---- curriculum_order -------------------------------------------
  // perplexity terciles (the perplexity_buckets CTEs — per-doc bits
  // rounded to 4 dp, exact interpolated thresholds) composed with the
  // shuffle_shard re-signed splitmix64 scatter, partitioned per
  // (stage, shard); the position-weighted checksum replays the ORDER
  private def curriculumOrderSql: String =
    s"""WITH tk AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok FROM documents),
       |freq AS (SELECT tok, count(*) AS n_w FROM tk GROUP BY tok),
       |tot AS (SELECT CAST(SUM(n_w) AS DOUBLE) AS total FROM freq),
       |scored AS (SELECT doc_id, count(*) AS n_tokens,
       |    ROUND(AVG(log2(total) - log2(n_w)), 4) AS bits
       |  FROM tk JOIN freq USING (tok) CROSS JOIN tot GROUP BY doc_id),
       |th AS (SELECT quantile_cont(bits, CAST(1 AS DOUBLE)/3) AS t1,
       |              quantile_cont(bits, CAST(2 AS DOUBLE)/3) AS t2 FROM scored),
       |bk AS (SELECT doc_id, n_tokens,
       |    CASE WHEN bits <= t1 THEN 'head' WHEN bits <= t2 THEN 'middle' ELSE 'tail' END AS bucket
       |  FROM scored, th),
       |h0 AS (SELECT doc_id, n_tokens, bucket, (${smix("doc_id::HUGEINT")})::HUGEINT AS h FROM bk),
       |s AS (SELECT doc_id, n_tokens, bucket,
       |    (h - CASE WHEN h >= 9223372036854775808 THEN $W64::HUGEINT ELSE 0::HUGEINT END) AS skey
       |  FROM h0),
       |p AS (SELECT doc_id, n_tokens, bucket,
       |    (((skey % 4) + 4) % 4) AS shard,
       |    row_number() OVER (PARTITION BY bucket, (((skey % 4) + 4) % 4)
       |                       ORDER BY skey, doc_id) - 1 AS pos
       |  FROM s)
       |SELECT bucket, CAST(shard AS BIGINT) AS shard, count(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(MAX(CASE WHEN pos = 0 THEN doc_id END) AS BIGINT) AS head_id,
       |  CAST(SUM((pos + 1) * doc_id) AS BIGINT) AS ord_checksum
       |FROM p GROUP BY bucket, shard ORDER BY bucket, shard""".stripMargin

  // ---- mix_resample -----------------------------------------------
  // mixture weights as integer keep-thresholds (round half-up on both
  // engines), applied via the same re-signed splitmix64 floorMod
  private def mixResampleSql: String =
    s"""WITH d AS (SELECT doc_id, lang,
       |    len(string_split_regex(trim(text), ' +'))::BIGINT AS n_tok FROM documents),
       |per AS (SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS lang_tokens FROM d GROUP BY lang),
       |mt AS (SELECT MIN(lang_tokens) AS min_tokens FROM per),
       |wt AS (SELECT lang, LEAST(10000, CAST(ROUND(min_tokens * 10000.0 / lang_tokens) AS BIGINT)) AS thr
       |       FROM per, mt),
       |h0 AS (SELECT d.doc_id, d.lang, d.n_tok, w.thr,
       |    (${smix("doc_id::HUGEINT")})::HUGEINT AS h
       |  FROM d JOIN wt w USING (lang)),
       |kept AS (SELECT doc_id, lang, n_tok FROM h0
       |  WHERE ((((h - CASE WHEN h >= 9223372036854775808 THEN $W64::HUGEINT ELSE 0::HUGEINT END) % 10000) + 10000) % 10000) < thr)
       |SELECT lang, count(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       |  CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum
       |FROM kept GROUP BY lang ORDER BY lang""".stripMargin

  // ---- pipeline_survivors -----------------------------------------
  // The composed ingestion pipeline: training split → quality gate
  // (quality_gate's exact expressions) → keep-first per md5(text) →
  // NOT IN the decontamination hit set (decontaminate_ngram's gram
  // CTEs) → splitmix64 stratified sampling (sample_stratified's
  // re-signed floorMod) → per-lang survivor stats.
  private def pipelineSurvivorsSql: String =
    s"""WITH t AS (SELECT doc_id, lang, text, trim(text) AS tt, string_split_regex(trim(text), ' +') AS w
       |           FROM documents WHERE doc_id % 50 != 0),
       |m AS (SELECT doc_id, lang, text, len(w) AS nt,
       |  CASE WHEN len(w) = 0 THEN 0.0
       |       ELSE CAST(length(regexp_replace(tt, ' +', '', 'g')) AS DOUBLE) / len(w) END AS atl,
       |  CASE WHEN len(w) = 0 THEN 0.0
       |       ELSE CAST(len(list_filter(w, x -> x IN ('the','is','and','of','to','a','in'))) AS DOUBLE) / len(w) END AS sr
       |  FROM t),
       |q AS (SELECT doc_id, lang, text, nt FROM m
       |      WHERE nt >= 30 AND atl >= 4.0 AND atl <= 5.0 AND sr <= 0.10),
       |d AS (SELECT doc_id, lang, nt FROM (
       |    SELECT doc_id, lang, nt, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM q)
       |  WHERE rn = 1),
       |toks AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS tk FROM documents),
       |pos AS (SELECT doc_id, tk, unnest(range(1, len(tk) - 2)) AS i FROM toks WHERE len(tk) >= 4),
       |g AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+3], ' ') AS gram FROM pos),
       |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
       |contaminated AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram) WHERE g.doc_id % 50 != 0),
       |clean AS (SELECT d.* FROM d WHERE d.doc_id NOT IN (SELECT doc_id FROM contaminated)),
       |h0 AS (SELECT doc_id, lang, nt, (${smix("doc_id::HUGEINT")})::HUGEINT AS h FROM clean),
       |kept AS (SELECT doc_id, lang, nt FROM h0
       |  WHERE ((((h - CASE WHEN h >= 9223372036854775808 THEN $W64::HUGEINT ELSE 0::HUGEINT END) % 100) + 100) % 100)
       |        < CASE WHEN lang = 'en' THEN 25 ELSE 75 END)
       |SELECT lang, count(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS n_tokens,
       |  CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum
       |FROM kept GROUP BY lang ORDER BY lang""".stripMargin

  val all: Map[String, String] = Map(
    "fingerprint_winnow" -> fingerprintWinnowSql,
    "sample_stratified" -> sampleStratifiedSql,
    "quota_by_source" -> quotaBySourceSql,
    "mix_temperature" -> mixTemperatureSql,
    "embedding_rp" -> embeddingRpSql,
    "shuffle_shard" -> shuffleShardSql,
    "pipeline_survivors" -> pipelineSurvivorsSql,
    "mix_resample" -> mixResampleSql,
    "embed_knn_text" -> embedKnnTextSql,
    "rag_chunk_search" -> ragChunkSearchSql,
    "dedup_simhash" -> dedupSimhashSql,
    "multimodal_image_dedup" -> multimodalImageDedupSql,
    "multimodal_audio_dedup" -> multimodalAudioDedupSql,
    "multimodal_video_dedup" -> multimodalVideoDedupSql,
    "pipeline_media_survivors" -> pipelineMediaSurvivorsSql,
    "dedup_minhash" -> dedupMinhashSql,
    "dedup_incremental" -> dedupIncrementalSql,
    // the streamed ingest filter: per-micro-batch probes of the at-rest
    // corpus index union to exactly the one-shot incremental result
    // (disjoint batches, fixed corpus side) — one oracle, three
    // implementations
    "dedup_ingest_stream" -> dedupIncrementalSql,
    "dedup_ingest_stream_wb" -> dedupIngestWithinBatchSql,
    "dedup_components" -> dedupComponentsSql,
    "dedup_cluster_stats" -> dedupClusterStatsSql,
    "curriculum_order" -> curriculumOrderSql,
    "dedup_canon" -> dedupCanonSql,
    "chunk_cdc" -> chunkCdcSql,
    "knn_lsh" -> knnLshSql,
    // the optimizer-rule serving path: same planes, candidate union,
    // and rerank — one oracle serves the hand-built and rule-rewritten probes
    "knn_lsh_rule" -> knnLshSql,
    "knn_lsh_rule_filtered" -> knnLshRuleFilteredSql,
    "knn_filtered_adaptive" -> knnFilteredAdaptiveSql,
    // the rule-served form is decision-identical to the library ladder
    // (same layout family, filter, k and reporting), so the SAME replay
    // oracle adjudicates it — an engine whose REGISTRATION-level policy
    // escalates at a different boundary than the library call diverges
    "knn_filtered_rule_adaptive" -> knnFilteredAdaptiveSql,
    // the O12 REST envelope over the registered tier: chunk embeddings
    // ARE the embeddings rows and the metadata filter replays as
    // vec_id % 47 = 0, so the same ladder oracle adjudicates the whole
    // engine-state → bridge → rule → ladder → envelope path
    "search_o12_registered" -> knnFilteredAdaptiveSql,
    "knn_filtered_ivf_adaptive" -> knnFilteredIvfAdaptiveSql,
    // the at-rest/cached layout probes stored buckets but is candidate-
    // and rerank-identical to the transient probe — one oracle for both
    "knn_lsh_cached" -> knnLshSql,
    // incremental append: base ∪ delta bucketed separately is
    // bit-identical to one-pass bucketing (pure per-row hash), so the
    // incrementally-maintained index answers the full-corpus oracle
    "knn_lsh_append" -> knnLshSql,
    // the LSH-blocked kNN graph replays plane matrix, bucket equi-join,
    // set-union and rerank independently
    "knn_join_graph_lsh" -> knnJoinGraphLshSql,
    // the serving stream answered through the optimizer-rule probe:
    // per-request bucket unions + rerank replayed from scratch
    "knn_serve_stream_rule" -> knnServeStreamRuleSql,
    // the BATCHED serving stream: same exact-bucket candidate union,
    // self-exclusion and rerank as the per-request rule probe — the
    // batching is a plan-shape change, not a semantics change, so one
    // oracle pins both (a batch answered differently flips the hash)
    "knn_filtered_adaptive_batched" -> knnFilteredAdaptiveBatchedSql,
    "knn_filtered_ivf_batched_rule" -> knnFilteredIvfBatchedSql,
    "knn_filtered_batched_rule" -> knnFilteredAdaptiveBatchedSql,
    "knn_serve_stream_batched" -> knnServeStreamRuleSql,
    "knn_serve_batched_rule" -> knnServeStreamRuleSql,
    "knn_serve_stream_batched_mp" -> knnServeStreamBatchedMpSql,
    // the batched IVF serving path replays the SAME per-request rule
    // as the driver-loop gate (bit-identical probe ranking — see
    // KnnJoin.ivfServeBatched), so it shares its oracle
    "knn_serve_stream_batched_ivf" -> knnServeStreamIvfSql,
    "knn_serve_stream_ivf" -> knnServeStreamIvfSql,
    // batched IVF-PQ (library + rule): with the 300-wide per-request
    // shortlist PQ misranking cannot evict a true neighbor from any
    // probed-cluster pool, so the serve equals the EXACT batched IVF
    // serve over the same stride-53 coarse quantizer — the per-request
    // IVF replay pins it whole (assignment, probe lists, rerank)
    "knn_serve_batched_ivfpq" -> knnServeStreamIvfSql,
    "knn_serve_batched_ivfpq_rule" -> knnServeStreamIvfSql,
    "knn_lsh_multiprobe" -> knnLshMultiprobeSql,
    // the same 1-bit candidate rule served through the optimizer rule's
    // registered multi-probe policy — one oracle for both probes
    "knn_lsh_rule_multiprobe" -> knnLshMultiprobeSql,
    "ann_sq" -> annSqSql,
    "ann_ivf" -> annIvfSql,
    // the lifecycle gate: stale write -> frozen append -> recluster ->
    // swap; the retrained centroids are the stride-53 sample of the
    // combined corpus = ann_ivf's model, so the shared oracle's hash
    // PROVES recluster == a one-pass full write
    "ann_ivf_recluster" -> annIvfSql,
    "ann_ivf_rule" -> annIvfSql,
    "ann_ivf_append" -> annIvfSql,
    "ann_ivf_rule_clustered" -> annIvfRuleClusteredSql,
    "ann_lsh_rule_clustered" -> annLshRuleClusteredSql,
    // persisted-adjacency walk replay; Verify inlines the examined
    // neighbor lists into __HNSW_WALK_ADJ__ before DuckDB sees the SQL
    "ann_hnsw_walk" -> annHnswWalkSql,
    "ann_recall_exact" -> annRecallExactSql,
    // full-method replay incl. PQ; Verify inlines the trained codebook
    // into __PQ_CODEBOOK_CTE__ before the SQL reaches DuckDB
    "ann_recall" -> annRecallSql,
    // IVF-PQ with the exact-rerank tail is exactly the EXACT IVF
    // search over the same stride-53/nprobe-2 coarse quantizer
    // (PqKnn.searchIvfPqRefined; equivalence pinned in
    // AnnEquivalenceSpec) — one replay oracle serves both
    "ann_ivfpq" -> annIvfSql,
    // the rule-served composition: same coarse quantizer, trainer,
    // 100-wide shortlist and exact rerank as ann_ivfpq, so the same
    // equals-exact-IVF argument lets it share the IVF replay oracle
    // (the gate's requires pin the staged rewrite, its ADC stage and
    // the partition-filter probe)
    "ann_ivfpq_rule" -> annIvfSql,
    // trained-constants replay; Verify inlines the fitted centroids
    // into __KMEANS_CENTROIDS_CTE__ before the SQL reaches DuckDB
    "cluster_balance" -> clusterBalanceSql,
    "dedup_semantic" -> dedupSemanticSql,
  )
}
