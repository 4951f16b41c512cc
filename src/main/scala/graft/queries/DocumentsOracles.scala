package graft.queries

/** DuckDB oracle SQL for the [[Documents]] query pack, one entry per
  * `Documents.defs` key — split from Documents.scala purely for
  * reviewability (no behavior change). The shared CTE strings mirror
  * the Spark-side operators expression by expression; constants that
  * must agree between the two sides (df caps, PQ shape, paragraph
  * knobs) live in [[Documents]] and are imported here so they cannot
  * drift. */
private[queries] object DocumentsOracles {

  import Documents.{EmbDim, ParagraphBreakDivisor, ParagraphMaxDf, PqK, PqM, SharedJaccardDfCap}

  // ---- oracle SQL ----------------------------------------------------

  /** Whitespace tokenization, shared CTE. */
  private[queries] val wordsCte =
    """words AS (
         SELECT doc_id, text, lang, string_split_regex(trim(text), '\s+') AS ws FROM documents
       )"""

  /** Distinct word-3gram shingles per doc (guarded like the Spark side:
    * Spark's sequence(1, n) would count DOWN for n<1). */
  private[queries] val shinglesCte = wordsCte + """,
       sh0 AS (
         SELECT doc_id,
                CASE WHEN len(ws) >= 3
                     THEN list_distinct(list_transform(generate_series(1, len(ws)-2),
                            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                     ELSE []::VARCHAR[] END AS sh
         FROM words
       ),
       sh AS (SELECT doc_id, unnest(sh) AS s FROM sh0)"""

  /** [[shinglesCte]] plus the df-capped universe `shj` the shared
    * exact-Jaccard path computes over — mirror of `maxShingleDf =
    * Some(SharedJaccardDfCap)` in [[TextDedup.jaccardPairsFromRows]]. */
  private[queries] val cappedShinglesCte = shinglesCte + s""",
       shj AS (
         SELECT doc_id, s FROM sh
         WHERE s IN (SELECT s FROM sh GROUP BY s HAVING COUNT(1) <= $SharedJaccardDfCap))"""

  /** (doc_id, k, minhash) signature rows — mirror of the whole-row
    * Spark computation, in exploded relational form. */
  private[queries] val sigCte = shinglesCte + """,
       hs AS (
         SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS h FROM sh
       ),
       sig AS (
         SELECT doc_id, k,
                MIN(( (((k+1)*2654435761) % 2147483647) * h
                      + (((k+7)*976369) % 2147483647) ) % 2147483647) AS minhash
         FROM hs, (SELECT unnest(generate_series(0, 15)) AS k)
         GROUP BY doc_id, k
       )"""

  /** Per-doc 32-bit simhash — exploded mirror of the Spark fold. */
  private[queries] val simhashCte = wordsCte + """,
       th AS (
         SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS h
         FROM (SELECT doc_id, unnest(ws) AS t FROM words)
       ),
       bits AS (
         SELECT doc_id, b, SUM(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS v
         FROM th, (SELECT unnest(generate_series(0, 31)) AS b)
         GROUP BY doc_id, b
       ),
       shs AS (
         SELECT doc_id,
                CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sh
         FROM bits GROUP BY doc_id
       )"""

  /** Winnowing fingerprint selection (k=8, w=4), mirror of
    * [[graft.operators.TextAnalysis.winnowingFingerprints]] /
    * [[graft.functions.WinnowSelect]]: `sel` holds per-doc gram-hash
    * arrays (`hs`) plus the distinct rightmost-min window selections
    * (`ps`, 1-based). */
  private[queries] val winnowCte =
    """nrm AS (
         SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]+', '', 'g') AS nt FROM documents
       ),
       g AS (
         SELECT doc_id,
                CASE WHEN length(nt) >= 8
                     THEN list_transform(generate_series(1, length(nt)-7),
                            i -> ('0x' || substr(md5(substr(nt, i, 8)), 1, 8))::BIGINT)
                     ELSE []::BIGINT[] END AS hs
         FROM nrm
       ),
       sel AS (
         SELECT doc_id, hs,
                CASE WHEN len(hs) >= 1 THEN
                     list_distinct(list_transform(generate_series(1, greatest(len(hs)-3, 1)),
                       j -> CAST(j + len(hs[j:j+3])
                                 - list_position(list_reverse(hs[j:j+3]),
                                                 list_aggregate(hs[j:j+3], 'min')) AS INT)))
                ELSE []::INT[] END AS ps
         FROM g
       )"""

  /** Integer-quantized embeddings + exact squared norms. */
  private[queries] val quantCte =
    """e AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS v
         FROM embeddings
       ),
       en AS (
         SELECT vec_id, v,
                CAST(list_aggregate(list_transform(v, x -> x*x), 'sum') AS BIGINT) AS n2
         FROM e
       )"""

  private[queries] val dotSql =
    "CAST(list_aggregate(list_transform(list_zip(%s, %s), p -> p[1] * p[2]), 'sum') AS BIGINT)"

  /** Dedup-verdict CTE chain (exact Jaccard pairs → recursive-CTE
    * connected components → exact-fingerprint keepers → `j` with
    * (doc_id, exact_keeper, cluster_min)). Requires `WITH RECURSIVE`;
    * shared by q64 and the q85 pipeline. */
  private[queries] def verdictCtes = s"""$cappedShinglesCte,
       sizes AS (SELECT doc_id, COUNT(1) AS n FROM shj GROUP BY 1),
       inter AS (
         SELECT a.doc_id AS da, b.doc_id AS db, COUNT(1) AS i
         FROM shj a JOIN shj b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2
       ),
       pairs AS (
         SELECT da AS doc_a, db AS doc_b
         FROM inter
         JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
         WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
       ),
       edges AS (
         SELECT doc_a AS src, doc_b AS dst FROM pairs
         UNION
         SELECT doc_b, doc_a FROM pairs
       ),
       reach AS (
         SELECT DISTINCT src AS doc_id, src AS r FROM edges
         UNION
         SELECT e.src, r.r FROM edges e JOIN reach r ON r.doc_id = e.dst
       ),
       clus AS (SELECT doc_id, MIN(r) AS cluster_min FROM reach GROUP BY doc_id),
       fpk AS (
         SELECT doc_id,
                md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS fp
         FROM documents
       ),
       keepers AS (SELECT fp, MIN(doc_id) AS exact_keeper FROM fpk GROUP BY fp),
       j AS (
         SELECT f.doc_id, k.exact_keeper, c.cluster_min
         FROM fpk f JOIN keepers k USING (fp)
         LEFT JOIN clus c ON c.doc_id = f.doc_id
       )"""

  /** Trained k-means codebook (k=8, one Lloyd round from the seed
    * centroids), mirror of [[graft.operators.Similarity.kmeansCentroids]]:
    * `cn` holds (cell, cv, cn2). Requires [[quantCte]] in scope; uses
    * [[cosSql]] for the assignment argmax. */
  private[queries] def kmeansCte = s"""cents0 AS (SELECT vec_id AS cell, v AS cv, n2 AS cn2 FROM en WHERE vec_id < 8),
       cc1 AS (
         SELECT en.vec_id, c.cell,
                ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
         FROM en, cents0 c
       ),
       a1 AS (
         SELECT vec_id, cell FROM (
           SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
           FROM cc1) WHERE rn = 1
       ),
       kcomp AS (
         SELECT a1.cell, generate_subscripts(en.v, 1) AS i, unnest(en.v) AS x
         FROM en JOIN a1 USING (vec_id)
       ),
       sums AS (SELECT cell, i, SUM(x) AS sx, COUNT(1) AS cnt FROM kcomp GROUP BY 1, 2),
       cents1 AS (
         SELECT cell,
                list(CAST(trunc(CAST(sx AS DOUBLE) / cnt) AS BIGINT) ORDER BY i) AS cv
         FROM sums GROUP BY cell
       ),
       cn AS (
         SELECT cell, cv,
                CAST(list_aggregate(list_transform(cv, x -> x*x), 'sum') AS BIGINT) AS cn2
         FROM cents1
       )"""

  /** PQ mirror: slice → seed → one Lloyd round (integer-mean update,
    * the [[kmeansCte]] contract per subspace) → codes. `pcbn` holds
    * the trained codebooks, `pcodes` the (vec_id, sub, code, d2)
    * encoding. Requires [[quantCte]] in scope. */
  private[queries] def pqCte = pqCteOn("en")

  /** [[pqCte]] over an arbitrary (vec_id, v) source relation — the
    * residual chain (q141/q142) trains the same PQ on `renn`. */
  private[queries] def pqCteOn(src: String) = s"""subs AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS sub),
       sl AS (
         SELECT vec_id, sub, list_slice(v, sub*${EmbDim / PqM} + 1, sub*${EmbDim / PqM} + ${EmbDim / PqM}) AS sv
         FROM $src, subs
       ),
       sn AS (
         SELECT vec_id, sub, sv,
                CAST(list_aggregate(list_transform(sv, x -> x*x), 'sum') AS BIGINT) AS n2
         FROM sl
       ),
       pc0 AS (SELECT sub, vec_id AS cell, sv AS cv, n2 AS cn2 FROM sn WHERE vec_id < $PqK),
       pd1 AS (
         SELECT sn.vec_id, sn.sub, c.cell,
                sn.n2 + c.cn2 - 2*${dotSql.format("sn.sv", "c.cv")} AS d2
         FROM sn JOIN pc0 c ON c.sub = sn.sub
       ),
       pa1 AS (
         SELECT vec_id, sub, cell FROM (
           SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, cell ASC) AS rn
           FROM pd1) WHERE rn = 1
       ),
       pcomp AS (
         SELECT pa1.sub, pa1.cell, generate_subscripts(sn.sv, 1) AS i, unnest(sn.sv) AS x
         FROM sn JOIN pa1 ON pa1.vec_id = sn.vec_id AND pa1.sub = sn.sub
       ),
       psums AS (SELECT sub, cell, i, SUM(x) AS sx, COUNT(1) AS cnt FROM pcomp GROUP BY 1, 2, 3),
       pcb AS (
         SELECT sub, cell,
                list(CAST(trunc(CAST(sx AS DOUBLE) / cnt) AS BIGINT) ORDER BY i) AS cv
         FROM psums GROUP BY 1, 2
       ),
       pcbn AS (
         SELECT sub, cell, cv,
                CAST(list_aggregate(list_transform(cv, x -> x*x), 'sum') AS BIGINT) AS cn2
         FROM pcb
       ),
       pd2 AS (
         SELECT sn.vec_id, sn.sub, c.cell,
                sn.n2 + c.cn2 - 2*${dotSql.format("sn.sv", "c.cv")} AS d2
         FROM sn JOIN pcbn c ON c.sub = sn.sub
       ),
       pcodes AS (
         SELECT vec_id, sub, cell AS code, d2 FROM (
           SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, cell ASC) AS rn
           FROM pd2) WHERE rn = 1
       )"""

  /** LSH-band-blocked embedding near-dup candidate chain (mirror of
    * [[graft.operators.Similarity.neardupPairs]]): hyperplanes →
    * buckets → two 4-bit bands → candidate pairs → `ndscored`
    * (vec_a, vec_b, cosine) — threshold applied by the caller.
    * Requires [[quantCte]] in scope; shared by q43 and q144. */
  private[queries] def neardupCte = s"""hp AS (
         SELECT h, i, ('0x' || substr(md5('hp_' || h || '_' || i), 1, 15))::BIGINT % 2001 - 1000 AS hv
         FROM (SELECT unnest(generate_series(0, 7)) AS h), (SELECT unnest(generate_series(1, 64)) AS i)
       ),
       comp AS (SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM e),
       dots AS (
         SELECT c.vec_id, hp.h, SUM(c.x * hp.hv) AS d
         FROM comp c JOIN hp ON hp.i = c.i GROUP BY 1, 2
       ),
       buckets AS (
         SELECT vec_id, CAST(SUM(CASE WHEN d > 0 THEN (1::BIGINT << h) ELSE 0 END) AS BIGINT) AS bucket
         FROM dots GROUP BY 1
       ),
       eb AS (SELECT en.vec_id, en.v, en.n2, b.bucket FROM en JOIN buckets b USING (vec_id)),
       bands AS (
         SELECT vec_id, 0 AS band, bucket & 15 AS bval FROM eb
         UNION ALL
         SELECT vec_id, 1 AS band, (bucket >> 4) & 15 AS bval FROM eb
       ),
       cand AS (
         SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id
       ),
       ndscored AS (
         SELECT c.va AS vec_a, c.vb AS vec_b,
                ${cosSql("ea.v", "eb2.v", "ea.n2", "eb2.n2")} AS cosine
         FROM cand c JOIN en ea ON ea.vec_id = c.va JOIN en eb2 ON eb2.vec_id = c.vb
       )"""

  /** Guarded cosine, mirroring [[graft.operators.Similarity.cosine]]:
    * NULL (not inf/NaN) when either squared norm is 0 — a zero
    * quantized embedding must hash-compare identically on both
    * engines. */
  private[queries] def cosSql(av: String, bv: String, an2: String, bn2: String) =
    s"""CASE WHEN $an2 > 0 AND $bn2 > 0
             THEN CAST(${dotSql.format(av, bv)} AS DOUBLE)
                    / (sqrt(CAST($an2 AS DOUBLE)) * sqrt(CAST($bn2 AS DOUBLE)))
        END"""

  val oracles: Map[String, String] = Map(
    "q30_exact_dedup" ->
      """SELECT md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS fp,
                MIN(doc_id) AS keeper_doc_id, COUNT(1) AS n_docs
         FROM documents GROUP BY 1""",

    "q31_ngram_jaccard_pairs" ->
      s"""WITH $cappedShinglesCte,
          sizes AS (SELECT doc_id, COUNT(1) AS n FROM shj GROUP BY 1),
          inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(1) AS i
            FROM shj a JOIN shj b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
          )
          SELECT da AS doc_a, db AS doc_b,
                 CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
          FROM inter
          JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
          WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8""",

    "q32_minhash_signatures" ->
      s"""WITH $sigCte
          SELECT doc_id, CAST(k AS INT) AS k, minhash FROM sig""",

    "q33_minhash_lsh_pairs" ->
      s"""WITH $sigCte,
          bands AS (
            SELECT doc_id, k // 2 AS band,
                   SUM(CASE WHEN k % 2 = 0 THEN minhash * 2147483647 ELSE minhash END) AS band_key
            FROM sig GROUP BY doc_id, k // 2
          ),
          cand AS (
            SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
          ),
          eq AS (
            SELECT c.da, c.db, COUNT(CASE WHEN sa.minhash = sb.minhash THEN 1 END) AS neq
            FROM cand c
            JOIN sig sa ON sa.doc_id = c.da
            JOIN sig sb ON sb.doc_id = c.db AND sb.k = sa.k
            GROUP BY 1, 2
          )
          SELECT da AS doc_a, db AS doc_b, neq / 16.0 AS est_jaccard
          FROM eq WHERE neq / 16.0 >= 0.5""",

    "q34_simhash" ->
      s"""WITH $simhashCte
          SELECT doc_id, sh FROM shs""",

    "q35_simhash_pairs" ->
      s"""WITH $simhashCte,
          blocks AS (
            SELECT doc_id, sh, j, (sh >> (8*j)) & 255 AS bval
            FROM shs, (SELECT unnest(generate_series(0, 3)) AS j)
          ),
          cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sh AS sha, b.sh AS shb
            FROM blocks a JOIN blocks b
              ON a.j = b.j AND a.bval = b.bval AND a.doc_id < b.doc_id
          )
          SELECT doc_a, doc_b, CAST(bit_count(xor(sha, shb)) AS INT) AS hamming
          FROM cand WHERE bit_count(xor(sha, shb)) <= 6""",

    "q36_cosine_topk" ->
      s"""WITH $quantCte,
          q AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2 FROM en WHERE vec_id IN (0,1,2,3,4)),
          scored AS (
            SELECT q.qid, c.vec_id AS cid,
                   ${cosSql("q.qv", "c.v", "q.qn2", "c.n2")} AS cosine
            FROM en c, q WHERE c.vec_id <> q.qid
          ),
          r AS (SELECT qid, cid, cosine,
                       row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
                FROM scored)
          SELECT qid, cid, cosine, CAST(rk AS INT) AS rk FROM r WHERE rk <= 10""",

    "q37_ann_lsh" ->
      s"""WITH $quantCte,
          hp AS (
            SELECT h, i, ('0x' || substr(md5('hp_' || h || '_' || i), 1, 15))::BIGINT % 2001 - 1000 AS hv
            FROM (SELECT unnest(generate_series(0, 7)) AS h), (SELECT unnest(generate_series(1, 64)) AS i)
          ),
          comp AS (SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM e),
          dots AS (
            SELECT c.vec_id, hp.h, SUM(c.x * hp.hv) AS d
            FROM comp c JOIN hp ON hp.i = c.i GROUP BY 1, 2
          ),
          buckets AS (
            SELECT vec_id, CAST(SUM(CASE WHEN d > 0 THEN (1::BIGINT << h) ELSE 0 END) AS BIGINT) AS bucket
            FROM dots GROUP BY 1
          ),
          eb AS (SELECT en.vec_id, en.v, en.n2, b.bucket FROM en JOIN buckets b USING (vec_id)),
          q AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2, bucket FROM eb WHERE vec_id IN (0,1,2,3,4)),
          scored AS (
            SELECT q.qid, c.vec_id AS cid, q.bucket,
                   ${cosSql("q.qv", "c.v", "q.qn2", "c.n2")} AS cosine
            FROM eb c JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.qid
          ),
          r AS (SELECT qid, cid, bucket, cosine,
                       row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
                FROM scored)
          SELECT qid, cid, bucket, cosine, CAST(rk AS INT) AS rk FROM r WHERE rk <= 5""",

    "q88_ann_multiprobe" ->
      s"""WITH $quantCte,
          hp AS (
            SELECT h, i, ('0x' || substr(md5('hp_' || h || '_' || i), 1, 15))::BIGINT % 2001 - 1000 AS hv
            FROM (SELECT unnest(generate_series(0, 7)) AS h), (SELECT unnest(generate_series(1, 64)) AS i)
          ),
          comp AS (SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM e),
          dots AS (
            SELECT c.vec_id, hp.h, SUM(c.x * hp.hv) AS d
            FROM comp c JOIN hp ON hp.i = c.i GROUP BY 1, 2
          ),
          buckets AS (
            SELECT vec_id, CAST(SUM(CASE WHEN d > 0 THEN (1::BIGINT << h) ELSE 0 END) AS BIGINT) AS bucket
            FROM dots GROUP BY 1
          ),
          eb AS (SELECT en.vec_id, en.v, en.n2, b.bucket FROM en JOIN buckets b USING (vec_id)),
          q AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2, bucket FROM eb WHERE vec_id IN (0,1,2,3,4)),
          pq AS (
            SELECT qid, qv, qn2,
                   xor(bucket, CASE WHEN j = 0 THEN 0 ELSE (1::BIGINT << (j-1)) END) AS bucket
            FROM q, (SELECT unnest(generate_series(0, 8)) AS j)
          ),
          scored AS (
            SELECT pq.qid, c.vec_id AS cid,
                   ${cosSql("pq.qv", "c.v", "pq.qn2", "c.n2")} AS cosine
            FROM eb c JOIN pq ON c.bucket = pq.bucket AND c.vec_id <> pq.qid
          ),
          r AS (SELECT qid, cid, cosine,
                       row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
                FROM scored)
          SELECT qid, cid, cosine, CAST(rk AS INT) AS rk FROM r WHERE rk <= 5""",

    "q43_embedding_neardup" ->
      s"""WITH $quantCte,
          $neardupCte
          SELECT vec_a, vec_b, cosine FROM ndscored WHERE cosine >= 0.35""",

    "q44_vocabulary" ->
      s"""WITH $wordsCte,
          tok AS (SELECT doc_id, unnest(ws) AS t FROM words)
          SELECT t, COUNT(DISTINCT doc_id) AS doc_freq, COUNT(1) AS occurrences
          FROM tok GROUP BY t
          ORDER BY doc_freq DESC, occurrences DESC, t ASC LIMIT 50""",

    "q45_ann_ivf" ->
      s"""WITH $quantCte,
          cents AS (SELECT vec_id AS cell, v AS cv, n2 AS cn2 FROM en WHERE vec_id < 16),
          cc AS (
            SELECT en.vec_id, en.v, en.n2, c.cell,
                   ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
            FROM en, cents c
          ),
          assigned AS (
            SELECT vec_id, v, n2, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc) WHERE rn = 1
          ),
          probes AS (
            SELECT vec_id AS qid, v AS qv, n2 AS qn2, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc WHERE vec_id IN (0,1,2,3,4)) WHERE rn <= 2
          ),
          scored AS (
            SELECT p.qid, a.vec_id AS cid, p.cell,
                   ${cosSql("p.qv", "a.v", "p.qn2", "a.n2")} AS cosine
            FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.qid
          ),
          r AS (SELECT qid, cid, cell, cosine,
                       row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
                FROM scored)
          SELECT qid, cid, cell, cosine, CAST(rk AS INT) AS rk FROM r WHERE rk <= 5""",

    "q53_dedup_clusters" ->
      s"""WITH RECURSIVE $cappedShinglesCte,
          sizes AS (SELECT doc_id, COUNT(1) AS n FROM shj GROUP BY 1),
          inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(1) AS i
            FROM shj a JOIN shj b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
          ),
          pairs AS (
            SELECT da AS doc_a, db AS doc_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
          ),
          edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b, doc_a FROM pairs
          ),
          reach AS (
            SELECT DISTINCT src AS doc_id, src AS r FROM edges
            UNION
            SELECT e.src, r.r FROM edges e JOIN reach r ON r.doc_id = e.dst
          )
          SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id""",

    "q51_profile" ->
      """WITH a AS (
           SELECT COUNT(1) AS n,
             COUNT(CASE WHEN doc_id IS NULL THEN 1 END) AS nu1, COUNT(DISTINCT doc_id) AS d1,
               CAST(MIN(doc_id) AS DOUBLE) AS mn1, CAST(MAX(doc_id) AS DOUBLE) AS mx1,
             COUNT(CASE WHEN text IS NULL THEN 1 END) AS nu2, COUNT(DISTINCT text) AS d2,
               CAST(MIN(length(text)) AS DOUBLE) AS mn2, CAST(MAX(length(text)) AS DOUBLE) AS mx2,
             COUNT(CASE WHEN lang IS NULL THEN 1 END) AS nu3, COUNT(DISTINCT lang) AS d3,
               CAST(MIN(length(lang)) AS DOUBLE) AS mn3, CAST(MAX(length(lang)) AS DOUBLE) AS mx3,
             COUNT(CASE WHEN source IS NULL THEN 1 END) AS nu4, COUNT(DISTINCT source) AS d4,
               CAST(MIN(length(source)) AS DOUBLE) AS mn4, CAST(MAX(length(source)) AS DOUBLE) AS mx4,
             COUNT(CASE WHEN n_chars IS NULL THEN 1 END) AS nu5, COUNT(DISTINCT n_chars) AS d5,
               CAST(MIN(n_chars) AS DOUBLE) AS mn5, CAST(MAX(n_chars) AS DOUBLE) AS mx5
           FROM documents)
         SELECT 'doc_id' AS col_name, 'bigint' AS dtype, n AS n_rows, nu1 AS n_nulls, d1 AS n_distinct, mn1 AS min_val, mx1 AS max_val FROM a
         UNION ALL SELECT 'text', 'string', n, nu2, d2, mn2, mx2 FROM a
         UNION ALL SELECT 'lang', 'string', n, nu3, d3, mn3, mx3 FROM a
         UNION ALL SELECT 'source', 'string', n, nu4, d4, mn4, mx4 FROM a
         UNION ALL SELECT 'n_chars', 'bigint', n, nu5, d5, mn5, mx5 FROM a""",

    "q52_split" ->
      """WITH h AS (
           SELECT n_chars,
                  ('0x' || substr(md5('split_' || doc_id), 1, 15))::BIGINT % 100 AS hv
           FROM documents)
         SELECT CASE WHEN hv < 80 THEN 'train' WHEN hv < 90 THEN 'val' ELSE 'test' END AS split,
                COUNT(1) AS n_docs,
                CAST(SUM(CAST(n_chars AS DECIMAL(28,4))) AS DOUBLE) AS sum_chars
         FROM h GROUP BY 1""",

    "q38_text_quality" ->
      s"""WITH $wordsCte,
          m AS (
            SELECT doc_id,
                   CAST(len(ws) AS BIGINT) AS n_tokens,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
                   CAST(list_aggregate(list_transform(ws, w -> length(w)), 'sum') AS DOUBLE) / len(ws) AS avg_word_len,
                   CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','in','to','is','that','it','for'))) AS DOUBLE) / len(ws) AS stopword_ratio,
                   CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS punct_count
            FROM words
          )
          SELECT doc_id, n_tokens, n_bpe_tokens, avg_word_len, stopword_ratio, punct_count,
                 least(1.0, n_tokens / 100.0) * 0.5
                   + least(1.0, stopword_ratio * 4) * 0.3
                   + CASE WHEN avg_word_len BETWEEN 3.0 AND 8.0 THEN 0.2 ELSE 0.0 END AS quality_score
          FROM m""",

    "q39_langid" ->
      s"""WITH $wordsCte,
          s AS (
            SELECT lang,
                   len(list_filter(ws, x -> x IN ('the','a','of','and','in','to','is','that','it','for'))) AS sen,
                   len(list_filter(ws, x -> x IN ('der','die','das','und','ist','nicht','mit','ein','zu','den'))) AS sde,
                   len(list_filter(ws, x -> x IN ('le','la','les','et','est','pas','pour','dans','une','que'))) AS sfr
            FROM words
          )
          SELECT lang,
                 CASE WHEN sen >= sde AND sen >= sfr THEN 'en'
                      WHEN sde >= sfr THEN 'de' ELSE 'fr' END AS predicted_lang,
                 COUNT(1) AS n_docs
          FROM s GROUP BY 1, 2""",

    // The image-decode oracles recompute the MANIFEST formula
    // (Multimodal.syntheticImages): width = 4 + id%13, height =
    // 3 + id%11, pixel(x,y) = (id*31 + x*7 + y*13) % 256 — Spark's
    // numbers come from actually decoding the PNG, so a hash match
    // proves the codec round trip, not a shared shortcut.
    "q40_multimodal_decode" ->
      """WITH dims AS (
           SELECT doc_id, CAST(4 + doc_id % 13 AS BIGINT) AS w,
                  CAST(3 + doc_id % 11 AS BIGINT) AS h
           FROM documents),
         px AS (
           SELECT doc_id, w, h, x, y, (doc_id*31 + x*7 + y*13) % 256 AS p
           FROM dims,
           LATERAL (SELECT unnest(generate_series(0, w-1)) AS x),
           LATERAL (SELECT unnest(generate_series(0, h-1)) AS y)
         )
         SELECT doc_id, 'png' AS format, w AS width, h AS height,
                CAST(SUM(p * (y*w + x + 1)) AS BIGINT) AS pixel_sum
         FROM px GROUP BY 1, 2, 3, 4""",

    "q49_multimodal_resize" ->
      """WITH dims AS (
           SELECT doc_id, CAST(4 + doc_id % 13 AS BIGINT) AS w,
                  CAST(3 + doc_id % 11 AS BIGINT) AS h
           FROM documents),
         nd AS (
           SELECT doc_id, w, h,
                  CAST(CASE WHEN 8*h <= 6*w THEN 8 ELSE GREATEST(1, 6*w // h) END AS BIGINT) AS nw,
                  CAST(CASE WHEN 8*h <= 6*w THEN GREATEST(1, 8*h // w) ELSE 6 END AS BIGINT) AS nh
           FROM dims),
         px AS (
           SELECT doc_id, w, h, nw, nh, x, y,
                  (doc_id*31 + (x*w // nw)*7 + (y*h // nh)*13) % 256 AS p
           FROM nd,
           LATERAL (SELECT unnest(generate_series(0, nw-1)) AS x),
           LATERAL (SELECT unnest(generate_series(0, nh-1)) AS y)
         )
         SELECT doc_id, w AS width, h AS height, nw AS new_width, nh AS new_height,
                CAST(SUM(p * (y*nw + x + 1)) AS BIGINT) AS resized_sum
         FROM px GROUP BY 1, 2, 3, 4, 5""",

    "q41_frame_sample" ->
      """SELECT doc_id, frame_idx,
                ('0x' || substr(md5(doc_id || '_' || frame_idx), 1, 15))::BIGINT AS frame_hash
         FROM (
           SELECT doc_id,
                  unnest(generate_series(0, CAST(octet_length(encode(text)) AS BIGINT) // 256, 4)) AS frame_idx
           FROM documents)""",

    "q54_winnowing" ->
      s"""WITH $winnowCte
         SELECT doc_id, gram_pos, hs[gram_pos] AS fp
         FROM (SELECT doc_id, hs, unnest(ps) AS gram_pos FROM sel)""",

    "q57_winnow_overlap" ->
      s"""WITH $winnowCte,
          dfp AS (
            SELECT DISTINCT doc_id, hs[gram_pos] AS fp
            FROM (SELECT doc_id, hs, unnest(ps) AS gram_pos FROM sel)
          ),
          keep AS (
            SELECT fp FROM (SELECT fp, COUNT(1) AS df FROM dfp GROUP BY 1) WHERE df <= 64
          ),
          fps AS (SELECT dfp.doc_id, dfp.fp FROM dfp JOIN keep USING (fp)),
          sizes AS (SELECT doc_id, COUNT(1) AS n FROM fps GROUP BY 1),
          shared AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(1) AS n_shared
            FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2
          )
          SELECT doc_a, doc_b, n_shared,
                 CAST(n_shared AS DOUBLE) / least(sa.n, sb.n) AS overlap
          FROM shared
          JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
          WHERE CAST(n_shared AS DOUBLE) / least(sa.n, sb.n) >= 0.5""",

    // q219: q57 with the df-cap measured over exact-content REPS
    // (rep = min doc_id per normalized-text md5 among fp-bearing
    // docs); cross-group pairs carry the rep pair's n_shared/overlap,
    // within-group pairs share every kept fp (overlap 1.0 exactly).
    "q219_winnow_overlap_reps" ->
      s"""WITH $winnowCte,
          dfp AS (
            SELECT DISTINCT doc_id, hs[gram_pos] AS fp
            FROM (SELECT doc_id, hs, unnest(ps) AS gram_pos FROM sel)
          ),
          nf AS (
            SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS nfp
            FROM documents WHERE doc_id IN (SELECT doc_id FROM dfp)
          ),
          mem AS (
            SELECT nf.doc_id, r.rep_id
            FROM nf JOIN (SELECT nfp, MIN(doc_id) AS rep_id FROM nf GROUP BY 1) r USING (nfp)
          ),
          rfps AS (
            SELECT doc_id, fp FROM dfp WHERE doc_id IN (SELECT rep_id FROM mem)
          ),
          keep AS (
            SELECT fp FROM (SELECT fp, COUNT(1) AS df FROM rfps GROUP BY 1) WHERE df <= 64
          ),
          kfps AS (SELECT rfps.doc_id, rfps.fp FROM rfps JOIN keep USING (fp)),
          sizes AS (SELECT doc_id, COUNT(1) AS n FROM kfps GROUP BY 1),
          rsel AS (
            SELECT ra, rb, n_shared,
                   CAST(n_shared AS DOUBLE) / least(sa.n, sb.n) AS overlap
            FROM (
              SELECT a.doc_id AS ra, b.doc_id AS rb, COUNT(1) AS n_shared
              FROM kfps a JOIN kfps b ON a.fp = b.fp AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            JOIN sizes sa ON sa.doc_id = ra JOIN sizes sb ON sb.doc_id = rb
            WHERE CAST(n_shared AS DOUBLE) / least(sa.n, sb.n) >= 0.5
          )
          SELECT least(ma.doc_id, mb.doc_id) AS doc_a,
                 greatest(ma.doc_id, mb.doc_id) AS doc_b,
                 n_shared, overlap
          FROM rsel JOIN mem ma ON ma.rep_id = ra JOIN mem mb ON mb.rep_id = rb
          UNION ALL
          SELECT ma.doc_id AS doc_a, mb.doc_id AS doc_b,
                 s.n AS n_shared, CAST(1.0 AS DOUBLE) AS overlap
          FROM mem ma JOIN mem mb ON ma.rep_id = mb.rep_id AND ma.doc_id < mb.doc_id
          JOIN sizes s ON s.doc_id = ma.rep_id""",

    "q58_decontamination" ->
      """WITH words AS (
           SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS ws FROM documents
         ),
         gr AS (
           SELECT doc_id, source,
                  CASE WHEN len(ws) >= 5
                       THEN list_distinct(list_transform(generate_series(1, len(ws)-4),
                              i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]))
                       ELSE []::VARCHAR[] END AS gs
           FROM words
         ),
         ex AS (SELECT doc_id, source, unnest(gs) AS s FROM gr),
         bg AS (SELECT DISTINCT s FROM ex WHERE source = 'src0')
         SELECT e.doc_id, COUNT(DISTINCT e.s) AS n_contaminated_grams
         FROM ex e JOIN bg ON e.s = bg.s
         WHERE e.source <> 'src0'
         GROUP BY 1""",

    // q176: q58's flag set rolled to the per-source rate in exact ppm.
    "q176_contamination_by_source" ->
      """WITH words AS (
           SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS ws FROM documents
         ),
         gr AS (
           SELECT doc_id, source,
                  CASE WHEN len(ws) >= 5
                       THEN list_distinct(list_transform(generate_series(1, len(ws)-4),
                              i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]))
                       ELSE []::VARCHAR[] END AS gs
           FROM words
         ),
         ex AS (SELECT doc_id, source, unnest(gs) AS s FROM gr),
         bg AS (SELECT DISTINCT s FROM ex WHERE source = 'src0'),
         flagged AS (
           SELECT DISTINCT e.doc_id FROM ex e JOIN bg ON e.s = bg.s WHERE e.source <> 'src0'
         )
         SELECT d.source,
                CAST(COUNT(1) AS BIGINT) AS n_docs,
                CAST(COUNT(f.doc_id) AS BIGINT) AS n_contaminated,
                CAST(COUNT(f.doc_id) * 1000000 // COUNT(1) AS BIGINT) AS contaminated_ppm
         FROM documents d LEFT JOIN flagged f ON d.doc_id = f.doc_id
         WHERE d.source <> 'src0'
         GROUP BY 1""",

    "q55_repetition" ->
      s"""WITH $wordsCte,
          b AS (
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_text_chars,
                   CAST(len(ws) AS BIGINT) AS n_tokens,
                   CAST(len(ws) - len(list_distinct(ws)) AS BIGINT) AS n_dup_tokens,
                   CASE WHEN len(ws) >= 2
                        THEN list_transform(generate_series(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1])
                        ELSE []::VARCHAR[] END AS bgs
            FROM words
          ),
          m AS (
            SELECT doc_id, n_text_chars, n_tokens, n_dup_tokens,
                   CAST(len(bgs) AS BIGINT) AS n_bigrams,
                   CAST(len(bgs) - len(list_distinct(bgs)) AS BIGINT) AS n_dup_bigrams,
                   bgs
            FROM b
          ),
          cnts AS (
            SELECT doc_id, bg, COUNT(1) AS cnt
            FROM (SELECT doc_id, unnest(bgs) AS bg FROM m) GROUP BY 1, 2
          ),
          top AS (
            SELECT doc_id, bg AS top_bigram, cnt AS top_bigram_cnt
            FROM (SELECT doc_id, bg, cnt,
                         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bg ASC) AS rn
                  FROM cnts)
            WHERE rn = 1
          )
          SELECT m.doc_id, n_tokens,
                 CAST(n_dup_tokens AS DOUBLE) / n_tokens AS dup_token_frac,
                 CASE WHEN n_bigrams > 0 THEN CAST(n_dup_bigrams AS DOUBLE) / n_bigrams END AS dup_bigram_frac,
                 top_bigram,
                 CAST(top_bigram_cnt AS BIGINT) AS top_bigram_cnt,
                 CAST(top_bigram_cnt * length(top_bigram) AS DOUBLE) / n_text_chars AS top_bigram_char_frac
          FROM m LEFT JOIN top ON m.doc_id = top.doc_id""",

    "q56_stratified_sample" ->
      """WITH h AS (
           SELECT lang, n_chars,
                  ('0x' || substr(md5('strat_' || doc_id), 1, 15))::BIGINT % 10000 AS hv
           FROM documents)
         SELECT lang, COUNT(1) AS n_docs,
                CAST(SUM(CAST(n_chars AS DECIMAL(28,4))) AS DOUBLE) AS sum_chars
         FROM h
         WHERE hv < CASE lang WHEN 'de' THEN 10000 WHEN 'en' THEN 5000 WHEN 'es' THEN 1000
                              WHEN 'fr' THEN 2500 WHEN 'zh' THEN 7500 ELSE 0 END
         GROUP BY 1""",

    "q59_lang_ngrams" ->
      s"""WITH $wordsCte,
          bg AS (
            SELECT lang,
                   unnest(CASE WHEN len(ws) >= 2
                               THEN list_transform(generate_series(1, len(ws)-1),
                                      i -> ws[i] || ' ' || ws[i+1])
                               ELSE []::VARCHAR[] END) AS gram
            FROM words
          ),
          c AS (SELECT lang, gram, COUNT(1) AS cnt FROM bg GROUP BY 1, 2),
          r AS (SELECT lang, gram, cnt,
                       row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, gram ASC) AS rk
                FROM c)
          SELECT lang, gram, cnt, CAST(rk AS INT) AS rk FROM r WHERE rk <= 5""",

    "q60_seq_packing" ->
      """WITH w AS (
           SELECT doc_id,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
           FROM documents
         ),
         c AS (
           SELECT doc_id, n,
                  CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
           FROM w
         )
         SELECT doc_id, n AS n_tokens, s AS start_offset,
                s // 512 AS bin_id,
                greatest(1, (s + n - 1) // 512 - s // 512 + 1) AS n_bins
         FROM c""",

    "q61_kmeans" ->
      s"""WITH $quantCte,
          $kmeansCte,
          cc2 AS (
            SELECT en.vec_id, c.cell,
                   ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
            FROM en, cn c
          )
          SELECT vec_id, cell AS cluster_id, ccos AS cosine FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
            FROM cc2) WHERE rn = 1""",

    "q63_ann_ivf_trained" ->
      s"""WITH $quantCte,
          $kmeansCte,
          cc2 AS (
            SELECT en.vec_id, en.v, en.n2, c.cell,
                   ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
            FROM en, cn c
          ),
          assigned AS (
            SELECT vec_id, v, n2, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc2) WHERE rn = 1
          ),
          probes AS (
            SELECT vec_id AS qid, v AS qv, n2 AS qn2, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc2 WHERE vec_id IN (0,1,2,3,4)) WHERE rn <= 2
          ),
          scored AS (
            SELECT p.qid, a.vec_id AS cid, p.cell,
                   ${cosSql("p.qv", "a.v", "p.qn2", "a.n2")} AS cosine
            FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.qid
          ),
          r AS (SELECT qid, cid, cell, cosine,
                       row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
                FROM scored)
          SELECT qid, cid, cell, cosine, CAST(rk AS INT) AS rk FROM r WHERE rk <= 5""",

    "q64_dedup_verdicts" ->
      s"""WITH RECURSIVE $verdictCtes
          SELECT doc_id,
                 COALESCE(cluster_min, exact_keeper) AS survivor_doc_id,
                 CASE WHEN doc_id = COALESCE(cluster_min, exact_keeper) THEN 'keep'
                      WHEN doc_id <> exact_keeper THEN 'drop_exact'
                      ELSE 'drop_near' END AS verdict
          FROM j""",

    "q62_pii_scrub" ->
      """WITH aug AS (
           SELECT doc_id,
                  text || ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com'
                    || CASE WHEN doc_id % 3 = 0
                            THEN ' or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                            ELSE '' END
                    || CASE WHEN doc_id % 5 = 0
                            THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.25'
                            ELSE '' END AS t
           FROM documents
         ),
         r AS (
           SELECT doc_id,
                  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
                  CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
                  CAST(len(regexp_extract_all(t, '\b\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
                  regexp_replace(regexp_replace(regexp_replace(t,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                    '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS red
           FROM aug
         )
         SELECT doc_id, n_emails, n_ips, n_phones,
                CAST(length(red) AS BIGINT) AS redacted_len,
                md5(red) AS redacted_hash
         FROM r""",

    "q72_tfidf" ->
      s"""WITH $wordsCte,
          tok AS (SELECT doc_id, unnest(ws) AS token FROM words),
          tf AS (SELECT doc_id, token, COUNT(1) AS tf FROM tok GROUP BY 1, 2),
          dfr AS (SELECT token, COUNT(1) AS df FROM tf GROUP BY 1),
          n AS (SELECT COUNT(1) AS n_docs FROM documents),
          s AS (
            SELECT tf.doc_id, tf.token, tf.tf, dfr.df,
                   CAST(tf.tf * (n.n_docs + 1) AS DOUBLE) / (dfr.df + 1) AS score
            FROM tf JOIN dfr USING (token), n
          )
          SELECT doc_id, token, tf, df, score, CAST(rk AS INT) AS rk FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rk
            FROM s) WHERE rk <= 3""",

    // Literals appear as the SAME expressions the Scala side computes,
    // and every NON-DYADIC literal (1.2) is cast to DOUBLE explicitly:
    // DuckDB parses bare 1.2 as a DECIMAL and would evaluate
    // tf*(1.2+1) in exact decimal arithmetic — one ulp off Scala's
    // double 1.2+1 (measured). Dyadic literals (0.5/0.75/1.0) are
    // exact in either type.
    "q73_bm25" ->
      s"""WITH $wordsCte,
          tok AS (SELECT doc_id, unnest(ws) AS token FROM words),
          dl AS (SELECT doc_id, COUNT(1) AS dl FROM tok GROUP BY 1),
          st AS (SELECT COUNT(1) AS n_docs, SUM(dl) AS sum_dl FROM dl),
          tf AS (
            SELECT doc_id, token, COUNT(1) AS tf FROM tok
            WHERE token IN ('spark', 'join', 'window', 'hash', 'filter') GROUP BY 1, 2
          ),
          dfr AS (SELECT token, COUNT(1) AS df FROM tf GROUP BY 1),
          sc AS (
            SELECT tf.doc_id, tf.token,
                   ((st.n_docs - dfr.df + 0.5) / (dfr.df + 0.5))
                     * (tf.tf * (CAST(1.2 AS DOUBLE) + 1))
                     / (tf.tf + CAST(1.2 AS DOUBLE) * (1.0 - 0.75 + 0.75 * dl.dl
                          / (CAST(st.sum_dl AS DOUBLE) / st.n_docs))) AS score_t
            FROM tf JOIN dfr USING (token) JOIN dl USING (doc_id), st
          ),
          g AS (
            SELECT doc_id,
                   SUM(CASE WHEN token = 'spark' THEN score_t END) AS s0,
                   SUM(CASE WHEN token = 'join' THEN score_t END) AS s1,
                   SUM(CASE WHEN token = 'window' THEN score_t END) AS s2,
                   SUM(CASE WHEN token = 'hash' THEN score_t END) AS s3,
                   SUM(CASE WHEN token = 'filter' THEN score_t END) AS s4
            FROM sc GROUP BY doc_id
          )
          SELECT doc_id,
                 COALESCE(s0, 0.0) + COALESCE(s1, 0.0) + COALESCE(s2, 0.0)
                   + COALESCE(s3, 0.0) + COALESCE(s4, 0.0) AS score
          FROM g ORDER BY score DESC, doc_id LIMIT 20""",

    "q74_temperature_sample" ->
      """WITH c AS (SELECT source, COUNT(1) AS n FROM documents GROUP BY source),
         m AS (SELECT MIN(n) AS nmin FROM c),
         r AS (
           SELECT source,
                  GREATEST(1, CAST(round(sqrt(CAST(nmin AS DOUBLE) / n) * 10000) AS BIGINT)) AS bps
           FROM c, m
         ),
         k AS (
           SELECT d.source, r.bps FROM documents d JOIN r USING (source)
           WHERE ('0x' || substr(md5('temp_' || doc_id), 1, 15))::BIGINT % 10000 < r.bps
         )
         SELECT source, COUNT(1) AS n_kept, MIN(bps) AS rate_bps FROM k GROUP BY source""",

    "q75_centroid_outliers" ->
      s"""WITH $quantCte,
          el AS (
            SELECT en.vec_id, en.v, en.n2, emb.label
            FROM en JOIN embeddings emb USING (vec_id)
          ),
          comp AS (SELECT label, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM el),
          sums AS (SELECT label, i, SUM(x) AS sx, COUNT(1) AS cnt FROM comp GROUP BY 1, 2),
          cent AS (
            SELECT label, list(CAST(trunc(CAST(sx AS DOUBLE) / cnt) AS BIGINT) ORDER BY i) AS cv
            FROM sums GROUP BY label
          ),
          cn AS (
            SELECT label, cv,
                   CAST(list_aggregate(list_transform(cv, x -> x*x), 'sum') AS BIGINT) AS cn2
            FROM cent
          ),
          sc AS (
            SELECT el.label, el.vec_id,
                   ${cosSql("el.v", "cn.cv", "el.n2", "cn.cn2")} AS centroid_cos
            FROM el JOIN cn USING (label)
          )
          SELECT label, vec_id, centroid_cos, CAST(rk AS INT) AS rk FROM (
            SELECT *, row_number() OVER (PARTITION BY label ORDER BY centroid_cos ASC, vec_id ASC) AS rk
            FROM sc) WHERE rk <= 3""",

    "q93_quality_verdicts" ->
      s"""WITH $wordsCte,
          m AS (
            SELECT doc_id,
                   CAST(len(ws) AS BIGINT) AS n_tokens,
                   least(1.0, len(ws) / 100.0) * 0.5
                     + least(1.0, (CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','in','to','is','that','it','for'))) AS DOUBLE) / len(ws)) * 4) * 0.3
                     + CASE WHEN CAST(list_aggregate(list_transform(ws, w -> length(w)), 'sum') AS DOUBLE) / len(ws) BETWEEN 3.0 AND 8.0 THEN 0.2 ELSE 0.0 END AS quality_score,
                   CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE) / len(ws) AS dup_token_frac
            FROM words
          )
          SELECT doc_id, n_tokens, quality_score, dup_token_frac,
                 n_tokens >= 30 AS pass_len,
                 quality_score >= 0.5 AS pass_quality,
                 dup_token_frac <= 0.6 AS pass_repetition,
                 CASE WHEN n_tokens >= 30 AND quality_score >= 0.5 AND dup_token_frac <= 0.6
                      THEN 'keep' ELSE 'drop' END AS verdict
          FROM m""",

    "q94_source_cap" ->
      """WITH r AS (
           SELECT doc_id, source AS "group",
                  row_number() OVER (
                    PARTITION BY source
                    ORDER BY md5('cap_' || doc_id), doc_id) AS rk
           FROM documents)
         SELECT doc_id, "group", CAST(rk AS INT) AS rk FROM r WHERE rk <= 10""",

    // Mirror of q33's band machinery with the parity split: odd-id
    // docs (the "new batch") probe even-id docs (the "index").
    "q95_incremental_neardup" ->
      s"""WITH $sigCte,
          bands AS (
            SELECT doc_id, k // 2 AS band,
                   SUM(CASE WHEN k % 2 = 0 THEN minhash * 2147483647 ELSE minhash END) AS band_key
            FROM sig GROUP BY doc_id, k // 2
          ),
          cand AS (
            SELECT DISTINCT a.doc_id AS dn, b.doc_id AS di
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_key = b.band_key
             AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
          ),
          eq AS (
            SELECT c.dn, c.di, COUNT(CASE WHEN sa.minhash = sb.minhash THEN 1 END) AS neq
            FROM cand c
            JOIN sig sa ON sa.doc_id = c.dn
            JOIN sig sb ON sb.doc_id = c.di AND sb.k = sa.k
            GROUP BY 1, 2
          )
          SELECT dn AS doc_id, di AS index_doc_id, neq / 16.0 AS est_jaccard
          FROM eq WHERE neq / 16.0 >= 0.5""",

    // q53's recursive-CTE clustering + q38's score expression, then
    // the same (quality DESC, doc_id ASC) argmax the struct-max
    // computes Spark-side.
    "q105_canonical_keepers" ->
      s"""WITH RECURSIVE $cappedShinglesCte,
          sizes AS (SELECT doc_id, COUNT(1) AS n FROM shj GROUP BY 1),
          inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(1) AS i
            FROM shj a JOIN shj b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
          ),
          pairs AS (
            SELECT da AS doc_a, db AS doc_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
          ),
          edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b, doc_a FROM pairs
          ),
          reach AS (
            SELECT DISTINCT src AS doc_id, src AS r FROM edges
            UNION
            SELECT e.src, r.r FROM edges e JOIN reach r ON r.doc_id = e.dst
          ),
          clus AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
          q AS (
            SELECT doc_id,
                   least(1.0, len(ws) / 100.0) * 0.5
                     + least(1.0, (CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','in','to','is','that','it','for'))) AS DOUBLE) / len(ws)) * 4) * 0.3
                     + CASE WHEN CAST(list_aggregate(list_transform(ws, w -> length(w)), 'sum') AS DOUBLE) / len(ws) BETWEEN 3.0 AND 8.0 THEN 0.2 ELSE 0.0 END AS qs
            FROM words
          ),
          g AS (
            SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS group_id, q.qs
            FROM documents d
            LEFT JOIN clus c ON c.doc_id = d.doc_id
            JOIN q ON q.doc_id = d.doc_id
          ),
          k AS (
            SELECT group_id, doc_id AS keeper_doc_id FROM (
              SELECT group_id, doc_id,
                     row_number() OVER (PARTITION BY group_id ORDER BY qs DESC, doc_id ASC) AS rn
              FROM g) WHERE rn = 1
          )
          SELECT g.doc_id, g.group_id, k.keeper_doc_id,
                 g.doc_id = k.keeper_doc_id AS is_keeper
          FROM g JOIN k ON k.group_id = g.group_id""",

    // Relational mirror of the segment pipeline: exclusive running sum
    // of break flags = segment index, string_agg in position order =
    // segment text, HAVING df > cap = the banned set.
    "q106_paragraph_dedup" ->
      s"""WITH $wordsCte,
          wf AS (SELECT doc_id, list_filter(ws, w -> w <> '') AS ws FROM words),
          tok AS (
            SELECT doc_id, i AS pos, ws[i] AS w,
                   CASE WHEN ('0x' || substr(md5(ws[i]), 1, 8))::BIGINT
                             % $ParagraphBreakDivisor = 0 THEN 1 ELSE 0 END AS brk
            FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
                  FROM wf WHERE len(ws) >= 1)
          ),
          sidx AS (
            SELECT doc_id, pos, w,
                   COALESCE(SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg
            FROM tok
          ),
          segs AS (
            SELECT doc_id, seg, MIN(pos) AS seg_start,
                   string_agg(w, ' ' ORDER BY pos) AS stext
            FROM sidx GROUP BY 1, 2
          ),
          hs AS (
            SELECT doc_id, seg_start, stext,
                   ('0x' || substr(md5(stext), 1, 15))::BIGINT AS h
            FROM segs
          ),
          banned AS (SELECT h FROM hs GROUP BY h HAVING COUNT(DISTINCT doc_id) > $ParagraphMaxDf),
          fl AS (SELECT doc_id, seg_start, stext, h IN (SELECT h FROM banned) AS b FROM hs)
          SELECT doc_id, COUNT(1) AS n_segments,
                 CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
                 COALESCE(string_agg(CASE WHEN NOT b THEN stext END, ' ' ORDER BY seg_start), '') AS clean_text
          FROM fl GROUP BY doc_id""",

  )
}
