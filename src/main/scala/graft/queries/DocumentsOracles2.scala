package graft.queries

/** Second half of the [[Documents]] oracle pack (q104+: maintenance,
  * semantic dedup, PQ, curation) — continuation of
  * [[DocumentsOracles]], same contract, split only to keep file sizes
  * reviewable. */
private[queries] object DocumentsOracles2 {

  import Documents.{EmbDim, ParagraphBreakDivisor, ParagraphMaxDf, PqK, PqM, SharedJaccardDfCap}
  import DocumentsOracles._

  /** aHash of every manifest image (q40's closed-form pixels): 8×8
    * block means in exact integer division, strict-> threshold vs the
    * grid mean, bit k = cell (k div 8, k mod 8). Shared by q163/q164. */
  private val aHashCte =
    """dims AS (
         SELECT doc_id, CAST(4 + doc_id % 13 AS BIGINT) AS w,
                CAST(3 + doc_id % 11 AS BIGINT) AS h
         FROM documents),
       acells AS (
         SELECT doc_id, w, h, gy*8 + gx AS k,
                gx*w // 8 AS x0, GREATEST(gx*w // 8 + 1, (gx+1)*w // 8) AS x1,
                gy*h // 8 AS y0, GREATEST(gy*h // 8 + 1, (gy+1)*h // 8) AS y1
         FROM dims,
         LATERAL (SELECT unnest(generate_series(0, 7)) AS gx),
         LATERAL (SELECT unnest(generate_series(0, 7)) AS gy)),
       acm AS (
         SELECT doc_id, k,
                CAST(SUM((doc_id*31 + x*7 + y*13) % 256) // COUNT(1) AS BIGINT) AS cv
         FROM acells,
         LATERAL (SELECT unnest(generate_series(x0, x1-1)) AS x),
         LATERAL (SELECT unnest(generate_series(y0, y1-1)) AS y)
         GROUP BY 1, 2),
       amean AS (SELECT doc_id, CAST(SUM(cv) // 64 AS BIGINT) AS mean FROM acm GROUP BY 1),
       shs AS (
         SELECT acm.doc_id,
                CAST(SUM(CASE WHEN cv > mean THEN
                       CASE WHEN k = 63 THEN -9223372036854775808
                            ELSE (1::BIGINT << CAST(k AS INT)) END
                     ELSE 0 END) AS BIGINT) AS sh
         FROM acm JOIN amean ON acm.doc_id = amean.doc_id
         GROUP BY 1)"""

  /** Mirror of [[graft.operators.Multimodal.audioHash64]] over the
    * closed-form WAV manifest (frames = 3 + id%11, amp(f) =
    * (id·37 + f·101)%1000, frame energy EXACTLY amp² — the q191
    * round-trip contract): 8 time cells read frame (c·n)//8, bit
    * (c·8+l) set iff 9·e ≥ (l+1)·max_e. Bit 63 is the Long sign bit —
    * added as the literal (1::BIGINT << 63 overflows DuckDB's shift).
    * Ends with `ash(doc_id, sh)`. */
  private val audioHashCte =
    """aud AS (
         SELECT doc_id, CAST(3 + doc_id % 11 AS BIGINT) AS n FROM documents),
       af AS (
         SELECT doc_id, n, f,
                ((doc_id*37 + f*101) % 1000) * ((doc_id*37 + f*101) % 1000) AS e
         FROM aud, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS f)),
       amx AS (SELECT doc_id, MAX(e) AS mx FROM af GROUP BY 1),
       ash AS (
         SELECT ac.doc_id,
                CAST(SUM(CASE WHEN e * 9 >= (l + 1) * mx THEN
                       CASE WHEN c*8 + l = 63 THEN -9223372036854775808
                            ELSE (1::BIGINT << CAST(c*8 + l AS INT)) END
                     ELSE 0 END) AS BIGINT) AS sh
         FROM (
           SELECT a.doc_id, c, (c * a.n) // 8 AS f
           FROM aud a, LATERAL (SELECT unnest(generate_series(0, 7)) AS c)
         ) ac
         JOIN af ON af.doc_id = ac.doc_id AND af.f = ac.f
         JOIN amx ON amx.doc_id = ac.doc_id,
         LATERAL (SELECT unnest(generate_series(0, 7)) AS l)
         GROUP BY 1)"""

  /** aHash of every sampled video KEYFRAME (every 4th frame of the
    * video manifest's 8×6 frames) — the [[aHashCte]] construction with
    * fixed dims and the frame term in the pixel formula. Ends with
    * `kfh(doc_id, f, sh)`. Mirrors
    * [[graft.operators.Multimodal.videoKeyframes]] → `aHash64`. */
  private val keyframeHashCte =
    """vkfn AS (
         SELECT doc_id, CAST(2 + doc_id % 7 AS BIGINT) AS n FROM documents),
       vkfr AS (
         SELECT doc_id, f FROM vkfn,
         LATERAL (SELECT unnest(generate_series(0, n - 1)) AS f)
         WHERE f % 4 = 0),
       kcells AS (
         SELECT doc_id, f, gy*8 + gx AS k,
                gx AS x0, gx + 1 AS x1,
                gy*6 // 8 AS y0, GREATEST(gy*6 // 8 + 1, (gy+1)*6 // 8) AS y1
         FROM vkfr,
         LATERAL (SELECT unnest(generate_series(0, 7)) AS gx),
         LATERAL (SELECT unnest(generate_series(0, 7)) AS gy)),
       kcm AS (
         SELECT doc_id, f, k,
                CAST(SUM((doc_id*31 + f*17 + x*7 + y*13) % 256) // COUNT(1) AS BIGINT) AS cv
         FROM kcells,
         LATERAL (SELECT unnest(generate_series(x0, x1-1)) AS x),
         LATERAL (SELECT unnest(generate_series(y0, y1-1)) AS y)
         GROUP BY 1, 2, 3),
       kmean AS (SELECT doc_id, f, CAST(SUM(cv) // 64 AS BIGINT) AS mean
                 FROM kcm GROUP BY 1, 2),
       kfh AS (
         SELECT kcm.doc_id, kcm.f,
                CAST(SUM(CASE WHEN cv > mean THEN
                       CASE WHEN k = 63 THEN -9223372036854775808
                            ELSE (1::BIGINT << CAST(k AS INT)) END
                     ELSE 0 END) AS BIGINT) AS sh
         FROM kcm JOIN kmean ON kcm.doc_id = kmean.doc_id AND kcm.f = kmean.f
         GROUP BY 1, 2)"""

  /** q187's mutual-pair chain over the even/odd modality split —
    * assignment, cell-mate candidates, per-side top-4 neighborhoods,
    * mutual top-1, integer margin. Requires [[quantCte]]/[[kmeansCte]]
    * (`en`, `cn`) in scope; ends with
    * `mp(a_id, b_id, cos_ppm, margin_ppm)`. ONE definition consumed by
    * the q210 card and the q212 histogram, so the pairing semantics
    * can never diverge between them. */
  private def mutualPairCtes =
    s"""cc2 AS (
          SELECT en.vec_id, c.cell,
                 ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
          FROM en, cn c
        ),
        asg AS (
          SELECT vec_id, cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
            FROM cc2) WHERE rn = 1
        ),
        m AS (SELECT en.vec_id, en.v, en.n2, asg.cell FROM en JOIN asg USING (vec_id)),
        cand AS (
          SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                 CAST(floor(${cosSql("a.v", "b.v", "a.n2", "b.n2")} * 1000000.0) AS BIGINT) AS cos_ppm
          FROM m a JOIN m b ON a.cell = b.cell
          WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
        ),
        cp AS (SELECT * FROM cand WHERE cos_ppm > 0),
        ra AS (
          SELECT *, row_number() OVER (PARTITION BY a_id ORDER BY cos_ppm DESC, b_id ASC) AS rn
          FROM cp
        ),
        rb AS (
          SELECT *, row_number() OVER (PARTITION BY b_id ORDER BY cos_ppm DESC, a_id ASC) AS rn
          FROM cp
        ),
        asx AS (
          SELECT a_id, SUM(cos_ppm) AS sa, COUNT(1) AS na,
                 MAX(CASE WHEN rn = 1 THEN b_id END) AS best_b,
                 MAX(CASE WHEN rn = 1 THEN cos_ppm END) AS best_cos
          FROM ra WHERE rn <= 4 GROUP BY a_id
        ),
        bsx AS (
          SELECT b_id, SUM(cos_ppm) AS sb, COUNT(1) AS nb,
                 MAX(CASE WHEN rn = 1 THEN a_id END) AS best_a
          FROM rb WHERE rn <= 4 GROUP BY b_id
        ),
        mp AS (
          SELECT a.a_id, b.b_id,
                 CAST(a.best_cos AS BIGINT) AS cos_ppm,
                 CAST((a.best_cos * 1000000) // (((a.sa // a.na) + (b.sb // b.nb)) // 2) AS BIGINT) AS margin_ppm
          FROM asx a JOIN bsx b ON a.best_b = b.b_id AND b.best_a = a.a_id
        )"""

  /** The two gate keep-sets (q137's caption gate, q169's image dedup
    * survivors) plus the annotated mutual pairs — shared by q210/q212.
    * Includes [[wordsCte]] and [[aHashCte]]; ends with
    * `ann(a_id, b_id, cos_ppm, margin_ppm, cap_ok, img_ok)`. Needs
    * WITH RECURSIVE (the image cluster reachability). */
  private def pairGateCtes =
    s"""$wordsCte,
        gm AS (
          SELECT doc_id,
                 CAST(len(ws) AS BIGINT) AS nt,
                 CAST(list_aggregate(list_transform(ws, w -> len(w)), 'sum') AS BIGINT) AS sumlen,
                 CAST(len(list_filter(ws, w -> list_contains(['the','a','of','and','in','to','is','that','it','for'], w))) AS BIGINT) AS stops,
                 CAST((len(text) - len(replace(text, '#', ''))) +
                      (len(text) - len(replace(text, '…', ''))) AS BIGINT) AS symbols,
                 text
          FROM words),
        capkeep AS (
          SELECT doc_id FROM gm
          WHERE nt >= 30 AND NOT (sumlen < nt * 3 OR sumlen > nt * 10)
            AND NOT symbols * 10 > nt
            AND NOT contains(lower(text), 'lorem ipsum')
            AND NOT contains(text, '{')
            AND stops >= 1),
        $aHashCte,
        apairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM shs a JOIN shs b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.sh, b.sh)) <= 3
        ),
        aedges AS (
          SELECT doc_a AS src, doc_b AS dst FROM apairs
          UNION
          SELECT doc_b, doc_a FROM apairs
        ),
        areach AS (
          SELECT DISTINCT src AS doc_id, src AS r FROM aedges
          UNION
          SELECT e.src, r.r FROM aedges e JOIN areach r ON r.doc_id = e.dst
        ),
        aclus AS (SELECT doc_id, MIN(r) AS cluster_min FROM areach GROUP BY doc_id),
        aek AS (SELECT sh, MIN(doc_id) AS exact_keeper FROM shs GROUP BY 1),
        imgkeep AS (
          SELECT s.doc_id
          FROM shs s JOIN aek USING (sh) LEFT JOIN aclus USING (doc_id)
          WHERE s.doc_id = COALESCE(aclus.cluster_min, aek.exact_keeper)),
        ann AS (
          SELECT mp.*,
                 (a_id IN (SELECT doc_id FROM capkeep)) AS cap_ok,
                 (b_id IN (SELECT doc_id FROM imgkeep)) AS img_ok
          FROM mp)"""

  /** Mirror of [[graft.operators.Multimodal.decodeVideoFrames]] over
    * the closed-form AVI manifest (frames = 2 + id%7, 8×6 gray,
    * pixel = (id·31 + f·17 + x·7 + y·13) % 256): per-frame mean luma
    * = Σpixels // 48 exactly. Ends with
    * `vml(doc_id, n_frames, frame_idx, mean_luma)`. */
  private val videoLumaCte =
    """vid AS (
         SELECT doc_id, CAST(2 + doc_id % 7 AS BIGINT) AS n FROM documents),
       vfr AS (
         SELECT doc_id, n, f
         FROM vid, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS f)),
       vpx AS (
         SELECT doc_id, n, f, (doc_id*31 + f*17 + x*7 + y*13) % 256 AS p
         FROM vfr,
         LATERAL (SELECT unnest(generate_series(0, 7)) AS x),
         LATERAL (SELECT unnest(generate_series(0, 5)) AS y)),
       vml AS (
         SELECT doc_id, n AS n_frames, f AS frame_idx,
                CAST(SUM(p) // 48 AS BIGINT) AS mean_luma
         FROM vpx GROUP BY 1, 2, 3)"""

  /** The video barcode over `vml` — the SAME thermometer form as
    * [[audioHashCte]] (mirror of
    * [[graft.operators.Multimodal.videoHash64]]). Appends to
    * [[videoLumaCte]]; ends with `vsh(doc_id, sh)`. */
  private val videoHashCte =
    s"""$videoLumaCte,
       vmx AS (SELECT doc_id, MAX(mean_luma) AS mx FROM vml GROUP BY 1),
       vsh AS (
         SELECT vc.doc_id,
                CAST(SUM(CASE WHEN mean_luma * 9 >= (l + 1) * mx THEN
                       CASE WHEN c*8 + l = 63 THEN -9223372036854775808
                            ELSE (1::BIGINT << CAST(c*8 + l AS INT)) END
                     ELSE 0 END) AS BIGINT) AS sh
         FROM (
           SELECT doc_id, n, c, (c * n) // 8 AS f
           FROM vid, LATERAL (SELECT unnest(generate_series(0, 7)) AS c)
         ) vc
         JOIN vml ON vml.doc_id = vc.doc_id AND vml.frame_idx = vc.f
         JOIN vmx ON vmx.doc_id = vc.doc_id,
         LATERAL (SELECT unnest(generate_series(0, 7)) AS l)
         GROUP BY 1)"""

  /** q173's closed-form URL manifest + the canonicalizer mirrored
    * operator by operator (fragment strip, lowercase scheme/host,
    * default-port strip, tracking-param drop, param sort, empty path
    * → '/'). Ends with `c(doc_id, canonical_url)`. Shared by
    * q173/q181. Plain-concatenated (not interpolated): the regexes
    * contain `$` anchors. */
  private val urlCanonCtes =
    """u AS (
         SELECT doc_id,
           CASE doc_id % 5
             WHEN 0 THEN 'https://www.site' || (doc_id % 37) || '.com/doc/' || (doc_id % 211) || '?a=1&b=2'
             WHEN 1 THEN 'HTTPS://' || upper('www.site' || (doc_id % 37) || '.com') || ':443/doc/' || (doc_id % 211) || '?b=2&a=1#frag'
             WHEN 2 THEN 'https://www.site' || (doc_id % 37) || '.com/doc/' || (doc_id % 211) || '?utm_source=x&gclid&b=2&a=1'
             WHEN 3 THEN 'http://www.site' || (doc_id % 37) || '.com:80'
             ELSE 'http://www.site' || (doc_id % 37) || '.com/'
           END AS url
         FROM documents
       ),
       p1 AS (
         SELECT doc_id, regexp_replace(trim(url), '#.*$', '') AS nofrag FROM u
       ),
       p2 AS (
         SELECT doc_id,
                lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                regexp_replace(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
         FROM p1
       ),
       p3 AS (
         SELECT doc_id, scheme, rest,
                lower(regexp_extract(rest, '^([^/?]+)', 1)) AS hostraw
         FROM p2
       ),
       p4 AS (
         SELECT doc_id, scheme,
                CASE WHEN scheme = 'http' THEN regexp_replace(hostraw, ':80$', '')
                     WHEN scheme = 'https' THEN regexp_replace(hostraw, ':443$', '')
                     ELSE hostraw END AS host,
                substr(rest, length(hostraw) + 1) AS pathq
         FROM p3
       ),
       p5 AS (
         SELECT doc_id, scheme, host,
                regexp_extract(pathq, '^([^?]*)', 1) AS path,
                list_aggregate(
                  list_sort(list_filter(
                    string_split(regexp_extract(pathq, '\?(.*)$', 1), '&'),
                    p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|gclid|fbclid)(=|$)'))),
                  'string_agg', '&') AS sortedq
         FROM p4
       ),
       c AS (
         SELECT doc_id,
                scheme || '://' || host ||
                  (CASE WHEN path = '' THEN '/' ELSE path END) ||
                  (CASE WHEN sortedq IS NOT NULL AND sortedq <> ''
                        THEN '?' || sortedq ELSE '' END) AS canonical_url
         FROM p5
       )"""

  /** The two deterministic snapshot versions q177/q180 diff (mirror of
    * `Documents.snapshotOld/New`): OLD misses every 7th doc and holds
    * the 7-char-truncated older text for every 5th; NEW misses
    * doc_id%11==3. Each ends with (doc_id, p). */
  private val snapshotCtes =
    """snap_o AS (
         SELECT doc_id,
                CASE WHEN doc_id % 5 = 0
                     THEN substr(text, 1, CAST(GREATEST(n_chars - 7, 1) AS INT))
                     ELSE text END AS p
         FROM documents WHERE doc_id % 7 <> 0
         UNION ALL
         SELECT -(2 * doc_id + 1), text FROM documents WHERE doc_id % 14 = 0
         UNION ALL
         SELECT -(2 * doc_id + 2), text FROM documents
         WHERE doc_id % 7 <> 0 AND doc_id % 15 = 0
       ),
       snap_n AS (
         SELECT doc_id, text AS p FROM documents WHERE doc_id % 11 <> 3
       )"""

  /** One DoReMi round as a SQL CTE block: given weights relation
    * `wIN`(source, w_ppm), emits `wOUT`(source, loss_ppm, excess_ppm,
    * w_ppm) — the mixture cell masses, Laplace rarities, per-domain
    * losses, mixture-mean reference, linear MW step and
    * renormalization, every step floor-division integer (mirror of
    * [[graft.operators.Profile.doremiRounds]]' round body). Requires
    * `sb`(source, b, cnt) and `occ`(source, n_occ) in scope. */
  private def doremiRoundCtes(wIn: String, wOut: String, tag: String): String =
    s"""t$tag AS (
         SELECT sb.source, sb.b, sb.cnt, o.n_occ, w.w_ppm,
                w.w_ppm * ((sb.cnt * 1000000) // o.n_occ) AS term
         FROM sb JOIN occ o USING (source) JOIN $wIn w USING (source)
       ),
       m$tag AS (SELECT b, SUM(term) // 1000000 AS mb FROM t$tag GROUP BY 1),
       r$tag AS (
         SELECT b,
                1000000 - (mb + 1) * 1000000 // ((SELECT SUM(mb) FROM m$tag) + 256) AS rar
         FROM m$tag
       ),
       l$tag AS (
         SELECT t$tag.source,
                SUM(r$tag.rar * t$tag.cnt) // MAX(t$tag.n_occ) AS loss_ppm,
                MAX(t$tag.w_ppm) AS w_prev
         FROM t$tag JOIN r$tag USING (b) GROUP BY 1
       ),
       s$tag AS (
         SELECT source, loss_ppm, w_prev,
                GREATEST(0, loss_ppm -
                  (SELECT SUM(w_prev * loss_ppm) FROM l$tag)
                    // GREATEST((SELECT SUM(w_prev) FROM l$tag), 1)) AS excess_ppm
         FROM l$tag
       ),
       u$tag AS (
         SELECT source, loss_ppm, excess_ppm,
                w_prev * (1000000 + 250000 * excess_ppm // 1000000) // 1000000 AS wu
         FROM s$tag
       ),
       $wOut AS (
         SELECT source, loss_ppm, excess_ppm,
                wu * 1000000 // GREATEST((SELECT SUM(wu) FROM u$tag), 1) AS w_ppm
         FROM u$tag
       )"""

  // q197/q198 are the score-once PRODUCTION shapes of q192/q195: the
  // result relation is identical by construction (only the engine's
  // execution shape differs — materialized score artifact vs inline
  // scorer re-evaluation), so they verify against the SAME SQL.
  val oracles: Map[String, String] = oraclesBase ++ Map(
    "q197_budget_prescored" -> oraclesBase("q192_budget_selection"),
    "q198_rank_prescored"   -> oraclesBase("q195_rank_disagreement"))

  private lazy val oraclesBase: Map[String, String] = Map(
    // The bloom gate is exact by construction (no false negatives),
    // so the oracle is the plain fingerprint membership join.
    "q104_bloom_dedup_gate" ->
      """WITH hist AS (
           SELECT DISTINCT md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS fp
           FROM documents WHERE doc_id % 2 = 0
         ),
         nb AS (
           SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS fp
           FROM documents WHERE doc_id % 2 = 1
         )
         SELECT nb.doc_id, (hist.fp IS NOT NULL) AS is_dup_exact
         FROM nb LEFT JOIN hist ON nb.fp = hist.fp""",

    // Mirror of dupSpans: word 6-gram 60-bit hashes → rightmost-min
    // winnow selection (the q54 sel formula at w=8) → cross-doc
    // df ≥ 2 → per-doc span merge.
    "q89_dup_spans" ->
      s"""WITH $wordsCte,
         g AS (
           SELECT doc_id,
                  CASE WHEN len(ws) >= 6
                       THEN list_transform(generate_series(1, len(ws)-5),
                              i -> ('0x' || substr(md5(ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||
                                                       ws[i+3]||' '||ws[i+4]||' '||ws[i+5]), 1, 15))::BIGINT)
                       ELSE []::BIGINT[] END AS hs
           FROM words
         ),
         sel AS (
           SELECT doc_id, hs,
                  CASE WHEN len(hs) >= 1 THEN
                       list_distinct(list_transform(generate_series(1, greatest(len(hs)-7, 1)),
                         j -> CAST(j + len(hs[j:j+7])
                                   - list_position(list_reverse(hs[j:j+7]),
                                                   list_aggregate(hs[j:j+7], 'min')) AS INT)))
                  ELSE []::INT[] END AS ps
           FROM g
         ),
         occ AS (
           SELECT doc_id, p, hs[p] AS h
           FROM (SELECT doc_id, hs, unnest(ps) AS p FROM sel)
         ),
         duph AS (SELECT h FROM occ GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
         d AS (SELECT o.doc_id, o.p FROM occ o JOIN duph USING (h)),
         l AS (SELECT doc_id, p, lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS pp FROM d),
         b AS (SELECT doc_id, p, CASE WHEN pp IS NULL OR p - pp > 8 THEN 1 ELSE 0 END AS brk FROM l),
         sid AS (
           SELECT doc_id, p,
                  SUM(brk) OVER (PARTITION BY doc_id ORDER BY p
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_idx
           FROM b
         )
         SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
                CAST(MIN(p) AS BIGINT) AS span_start_word,
                CAST(MAX(p) + 5 AS BIGINT) AS span_end_word, COUNT(1) AS n_anchors
         FROM sid GROUP BY 1, 2""",

    // Mirror of spanSurgery: the q89 anchor/winnow machinery, but the
    // duplicated-hash relation carries a MIN-doc keeper and only
    // non-keeper occurrences re-sessionize into excision spans.
    "q184_span_surgery" ->
      s"""WITH $wordsCte,
         g AS (
           SELECT doc_id,
                  CASE WHEN len(ws) >= 6
                       THEN list_transform(generate_series(1, len(ws)-5),
                              i -> ('0x' || substr(md5(ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||
                                                       ws[i+3]||' '||ws[i+4]||' '||ws[i+5]), 1, 15))::BIGINT)
                       ELSE []::BIGINT[] END AS hs
           FROM words
         ),
         sel AS (
           SELECT doc_id, hs,
                  CASE WHEN len(hs) >= 1 THEN
                       list_distinct(list_transform(generate_series(1, greatest(len(hs)-7, 1)),
                         j -> CAST(j + len(hs[j:j+7])
                                   - list_position(list_reverse(hs[j:j+7]),
                                                   list_aggregate(hs[j:j+7], 'min')) AS INT)))
                  ELSE []::INT[] END AS ps
           FROM g
         ),
         occ AS (
           SELECT doc_id, p, hs[p] AS h
           FROM (SELECT doc_id, hs, unnest(ps) AS p FROM sel)
         ),
         duph AS (
           SELECT h, MIN(doc_id) AS keeper
           FROM occ GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
         ),
         d AS (
           SELECT o.doc_id, o.p FROM occ o JOIN duph USING (h)
           WHERE o.doc_id <> duph.keeper
         ),
         l AS (SELECT doc_id, p, lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS pp FROM d),
         b AS (SELECT doc_id, p, CASE WHEN pp IS NULL OR p - pp > 8 THEN 1 ELSE 0 END AS brk FROM l),
         sid AS (
           SELECT doc_id, p,
                  SUM(brk) OVER (PARTITION BY doc_id ORDER BY p
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_idx
           FROM b
         ),
         sp AS (
           SELECT doc_id, span_idx, MIN(p) AS s, MAX(p) + 5 AS e
           FROM sid GROUP BY 1, 2
         ),
         per AS (
           SELECT doc_id, COUNT(1) AS n_spans, SUM(e - s + 1) AS words_removed
           FROM sp GROUP BY 1
         ),
         nt AS (SELECT doc_id, len(ws) AS n_tokens FROM words)
         SELECT nt.doc_id,
                CAST(n_tokens AS BIGINT) AS n_tokens,
                CAST(COALESCE(n_spans, 0) AS BIGINT) AS n_spans,
                CAST(COALESCE(words_removed, 0) AS BIGINT) AS words_removed,
                CAST(n_tokens - COALESCE(words_removed, 0) AS BIGINT) AS words_kept
         FROM nt LEFT JOIN per USING (doc_id)""",

    // Mirror of hashedQualityScores: token → bucket (hash60 % 1024)
    // → closed-form milli-weight, summed per doc. hash60 is always
    // positive so % == pmod.
    "q185_hashed_quality" ->
      s"""WITH $wordsCte,
         occ AS (
           SELECT doc_id,
                  ('0x' || substr(md5('qw_' ||
                      (('0x' || substr(md5(t), 1, 15))::BIGINT % 1024)), 1, 15))::BIGINT
                    % 2001 - 1000 AS w_milli
           FROM (SELECT doc_id, unnest(ws) AS t FROM words)
         ),
         per AS (
           SELECT doc_id,
                  COUNT(1) AS n_tokens,
                  CAST(SUM(w_milli) AS BIGINT) AS logit_milli
           FROM occ GROUP BY doc_id
         )
         SELECT doc_id, n_tokens, logit_milli,
                CAST(logit_milli AS DOUBLE) / n_tokens AS avg_w_milli,
                logit_milli >= 0 AS pass
         FROM per""",

    // Mirror of cmsHeavyHitters: depth=4 × width=512 counter table,
    // exact top-32 (count desc, token asc), estimate = min over
    // depths of the probed counter. Buckets come from ONE md5 per
    // token + the minhash-perm closed form (the sigCte family).
    "q186_cms_heavyhitters" ->
      s"""WITH $wordsCte,
         tok AS (
           SELECT t, ('0x' || substr(md5(t), 1, 15))::BIGINT % 2147483647 AS hp
           FROM (SELECT unnest(ws) AS t FROM words)
         ),
         dj AS (SELECT unnest(generate_series(0, 3)) AS j),
         jb AS (
           SELECT j,
                  (( (((j+1)*2654435761) % 2147483647) * hp
                     + (((j+7)*976369) % 2147483647) ) % 2147483647) % 512 AS b
           FROM tok, dj
         ),
         counters AS (SELECT j, b, COUNT(1) AS c FROM jb GROUP BY 1, 2),
         exact AS (
           SELECT t, hp, COUNT(1) AS exact_count FROM tok GROUP BY t, hp
           ORDER BY exact_count DESC, t ASC LIMIT 32
         ),
         est AS (
           SELECT e.t, e.exact_count, MIN(c.c) AS cms_estimate
           FROM exact e, dj
           JOIN counters c
             ON c.j = dj.j
            AND c.b = (( (((dj.j+1)*2654435761) % 2147483647) * e.hp
                         + (((dj.j+7)*976369) % 2147483647) ) % 2147483647) % 512
           GROUP BY 1, 2
         )
         SELECT t AS token,
                CAST(exact_count AS BIGINT) AS exact_count,
                CAST(cms_estimate AS BIGINT) AS cms_estimate,
                CAST(cms_estimate - exact_count AS BIGINT) AS overestimate
         FROM est""",

    // Mirror of marginMutualPairs: q61's trained-codebook assignment
    // over BOTH parities, cell-restricted A(even)×B(odd) candidates,
    // floor(cos·1e6) integer scoring, per-side top-4 (row_number,
    // ties id-asc), mutual top-1 join, integer ratio margin.
    "q187_mutual_pairs" ->
      s"""WITH $quantCte,
          $kmeansCte,
          cc2 AS (
            SELECT en.vec_id, c.cell,
                   ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
            FROM en, cn c
          ),
          asg AS (
            SELECT vec_id, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc2) WHERE rn = 1
          ),
          m AS (SELECT en.vec_id, en.v, en.n2, asg.cell FROM en JOIN asg USING (vec_id)),
          cand AS (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                   CAST(floor(${cosSql("a.v", "b.v", "a.n2", "b.n2")} * 1000000.0) AS BIGINT) AS cos_ppm
            FROM m a JOIN m b ON a.cell = b.cell
            WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
          ),
          cp AS (SELECT * FROM cand WHERE cos_ppm > 0),
          ra AS (
            SELECT *, row_number() OVER (PARTITION BY a_id ORDER BY cos_ppm DESC, b_id ASC) AS rn
            FROM cp
          ),
          rb AS (
            SELECT *, row_number() OVER (PARTITION BY b_id ORDER BY cos_ppm DESC, a_id ASC) AS rn
            FROM cp
          ),
          asx AS (
            SELECT a_id, SUM(cos_ppm) AS sa, COUNT(1) AS na,
                   MAX(CASE WHEN rn = 1 THEN b_id END) AS best_b,
                   MAX(CASE WHEN rn = 1 THEN cos_ppm END) AS best_cos
            FROM ra WHERE rn <= 4 GROUP BY a_id
          ),
          bsx AS (
            SELECT b_id, SUM(cos_ppm) AS sb, COUNT(1) AS nb,
                   MAX(CASE WHEN rn = 1 THEN a_id END) AS best_a
            FROM rb WHERE rn <= 4 GROUP BY b_id
          )
          SELECT a.a_id, b.b_id,
                 CAST(a.best_cos AS BIGINT) AS cos_ppm,
                 CAST((a.best_cos * 1000000) // (((a.sa // a.na) + (b.sb // b.nb)) // 2) AS BIGINT) AS margin_ppm
          FROM asx a JOIN bsx b ON a.best_b = b.b_id AND b.best_a = a.a_id""",

    // q187 under the production hot-cell cap, mirrored EXACTLY: the
    // B (odd) side keeps only each cell's 4 lowest ids before the
    // cell join (the q129 head-cap rank: row_number per cell, id
    // asc); everything downstream — per-side top-4 neighborhoods,
    // mutual top-1, integer ratio margin — runs on the CAPPED
    // candidate relation.
    "q196_mutual_pairs_capped" ->
      s"""WITH $quantCte,
          $kmeansCte,
          cc2 AS (
            SELECT en.vec_id, c.cell,
                   ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
            FROM en, cn c
          ),
          asg AS (
            SELECT vec_id, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc2) WHERE rn = 1
          ),
          m AS (SELECT en.vec_id, en.v, en.n2, asg.cell FROM en JOIN asg USING (vec_id)),
          mb AS (
            SELECT vec_id, v, n2, cell FROM (
              SELECT m.*, row_number() OVER (PARTITION BY cell ORDER BY vec_id ASC) AS crn
              FROM m WHERE vec_id % 2 = 1) WHERE crn <= 4
          ),
          cand AS (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                   CAST(floor(${cosSql("a.v", "b.v", "a.n2", "b.n2")} * 1000000.0) AS BIGINT) AS cos_ppm
            FROM m a JOIN mb b ON a.cell = b.cell
            WHERE a.vec_id % 2 = 0
          ),
          cp AS (SELECT * FROM cand WHERE cos_ppm > 0),
          ra AS (
            SELECT *, row_number() OVER (PARTITION BY a_id ORDER BY cos_ppm DESC, b_id ASC) AS rn
            FROM cp
          ),
          rb AS (
            SELECT *, row_number() OVER (PARTITION BY b_id ORDER BY cos_ppm DESC, a_id ASC) AS rn
            FROM cp
          ),
          asx AS (
            SELECT a_id, SUM(cos_ppm) AS sa, COUNT(1) AS na,
                   MAX(CASE WHEN rn = 1 THEN b_id END) AS best_b,
                   MAX(CASE WHEN rn = 1 THEN cos_ppm END) AS best_cos
            FROM ra WHERE rn <= 4 GROUP BY a_id
          ),
          bsx AS (
            SELECT b_id, SUM(cos_ppm) AS sb, COUNT(1) AS nb,
                   MAX(CASE WHEN rn = 1 THEN a_id END) AS best_a
            FROM rb WHERE rn <= 4 GROUP BY b_id
          )
          SELECT a.a_id, b.b_id,
                 CAST(a.best_cos AS BIGINT) AS cos_ppm,
                 CAST((a.best_cos * 1000000) // (((a.sa // a.na) + (b.sb // b.nb)) // 2) AS BIGINT) AS margin_ppm
          FROM asx a JOIN bsx b ON a.best_b = b.b_id AND b.best_a = a.a_id""",

    // Mirror of q188: q185's per-doc score → floor(avg/100) bucket
    // clamped to [-10, 9], left-joined against the q85 keep set.
    "q188_quality_calibration" ->
      s"""WITH RECURSIVE $verdictCtes,
          keep AS (
            SELECT doc_id FROM j WHERE doc_id = COALESCE(cluster_min, exact_keeper)
          ),
          occ AS (
            SELECT doc_id,
                   ('0x' || substr(md5('qw_' ||
                       (('0x' || substr(md5(t), 1, 15))::BIGINT % 1024)), 1, 15))::BIGINT
                     % 2001 - 1000 AS w_milli
            FROM (SELECT doc_id, unnest(ws) AS t FROM words)
          ),
          per AS (
            SELECT doc_id, COUNT(1) AS n_tokens,
                   CAST(SUM(w_milli) AS BIGINT) AS logit_milli
            FROM occ GROUP BY doc_id
          ),
          bk AS (
            SELECT p.doc_id,
                   CAST(GREATEST(LEAST(floor((CAST(logit_milli AS DOUBLE) / n_tokens) / 100.0), 9.0), -10.0) AS BIGINT) AS bucket,
                   CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END AS f
            FROM per p LEFT JOIN keep k ON k.doc_id = p.doc_id
          )
          SELECT bucket, COUNT(1) AS n_rows,
                 CAST(SUM(f) AS BIGINT) AS n_flagged,
                 CAST((SUM(f) * 1000000) // COUNT(1) AS BIGINT) AS flagged_ppm
          FROM bk GROUP BY bucket""",

    // Mirror of q189 hllDistinctAudit (p = 8, m = 256, C = 53,
    // alpha_ppm = 7213*256*100000 // 257079 = 718272, 3-sigma bound
    // = 3*1040000 // 16 = 195000): same md5 60-bit hash, bucket =
    // h % 256, rho = 54 - msb-position of (h >> 8) via length(bin(x))
    // (minimal-width binary in both engines), max-register per
    // (source, bucket), all-integer estimate in HUGEINT.
    "q189_hll_distinct" ->
      """WITH w AS (
           SELECT source, string_split_regex(trim(text), '\s+') AS ws FROM documents
         ),
         toks AS (
           SELECT source,
                  unnest(CASE WHEN len(ws) >= 3
                              THEN list_transform(generate_series(1, len(ws)-2),
                                     i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                              ELSE []::VARCHAR[] END) AS t
           FROM w
         ),
         hb AS (
           SELECT source, h, h % 256 AS b,
                  CASE WHEN h < 256 THEN 53
                       ELSE 53 - length(bin(h >> 8)) END AS rho
           FROM (SELECT source, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM toks)
         ),
         regs AS (SELECT source, b, MAX(rho) AS register FROM hb GROUP BY 1, 2),
         est AS (
           SELECT source,
                  CAST((718272::HUGEINT * 65536 * (1::BIGINT << 53))
                       // ((SUM(1::BIGINT << (53 - register))
                           + (256 - COUNT(1)) * (1::HUGEINT << 53)) * 1000000)
                    AS BIGINT) AS hll_estimate
           FROM regs GROUP BY source
         ),
         ex AS (SELECT source, COUNT(DISTINCT h) AS exact_distinct FROM hb GROUP BY source)
         SELECT ex.source,
                CAST(exact_distinct AS BIGINT) AS exact_distinct,
                hll_estimate,
                CAST(abs(hll_estimate - exact_distinct) * 1000000 // exact_distinct AS BIGINT) AS err_ppm,
                (abs(hll_estimate - exact_distinct) * 1000000 // exact_distinct) <= 195000 AS in_bounds
         FROM ex JOIN est USING (source)""",

    // Mirror of Profile.domainReweight: 256 hashed-unigram cells
    // (md5-60bit % 256, Laplace-smoothed — the q97 convention),
    // rarity = 1e6 − freq_ppm, per-source mean rarity vs the corpus
    // mean, linear MW step w′ ∝ w·(1 + η·excess) with η = 0.25 in
    // ppm, renormalized — every step floor-division integer.
    "q190_domain_reweight" ->
      """WITH tok AS (
           SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS t
           FROM documents
         ),
         sb AS (
           SELECT source,
                  ('0x' || substr(md5(t), 1, 15))::BIGINT % 256 AS b,
                  COUNT(1) AS cnt
           FROM tok GROUP BY 1, 2
         ),
         tot AS (SELECT SUM(cnt) AS v FROM sb),
         dict AS (
           SELECT b, 1000000 - ((SUM(cnt) + 1) * 1000000) // (tot.v + 256) AS rarity
           FROM sb, tot GROUP BY b, tot.v
         ),
         per AS (
           SELECT sb.source, SUM(rarity * cnt) AS rsum, SUM(cnt) AS n_occ
           FROM sb JOIN dict USING (b) GROUP BY 1
         ),
         ref AS (SELECT SUM(rsum) AS rall, SUM(n_occ) AS nall FROM per),
         dc AS (SELECT source, COUNT(1) AS n_docs FROM documents GROUP BY 1),
         nd AS (SELECT SUM(n_docs) AS v FROM dc),
         st AS (
           SELECT p.source, d.n_docs, p.n_occ,
                  p.rsum // p.n_occ AS loss_ppm,
                  GREATEST(0, p.rsum // p.n_occ - r.rall // r.nall) AS excess_ppm,
                  d.n_docs * 1000000 // nd.v AS w0_ppm
           FROM per p JOIN dc d USING (source), ref r, nd
         ),
         w1 AS (
           SELECT *,
                  w0_ppm * (1000000 + 250000 * excess_ppm // 1000000) // 1000000 AS w1u
           FROM st
         ),
         wt AS (SELECT SUM(w1u) AS v FROM w1)
         SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                CAST(n_occ AS BIGINT) AS n_occ,
                CAST(loss_ppm AS BIGINT) AS loss_ppm,
                CAST(excess_ppm AS BIGINT) AS excess_ppm,
                CAST(w0_ppm AS BIGINT) AS w0_ppm,
                CAST(w1u * 1000000 // GREATEST(wt.v, 1) AS BIGINT) AS w1_ppm
         FROM w1, wt""",

    // Mirror of doremiRounds(rounds = 2): one corpus collapse to
    // (source, cell) partials, then TWO explicit MW rounds over that
    // bounded relation — round 1 from the natural token share,
    // round 2 from round 1's renormalized weights.
    "q199_doremi_rounds" ->
      s"""WITH tok AS (
           SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS t
           FROM documents
         ),
         sb AS (
           SELECT source,
                  ('0x' || substr(md5(t), 1, 15))::BIGINT % 256 AS b,
                  COUNT(1) AS cnt
           FROM tok GROUP BY 1, 2
         ),
         occ AS (SELECT source, SUM(cnt) AS n_occ FROM sb GROUP BY 1),
         w0 AS (
           SELECT source,
                  n_occ * 1000000 // (SELECT SUM(n_occ) FROM occ) AS w_ppm
           FROM occ
         ),
         ${doremiRoundCtes("w0", "w1", "x")},
         ${doremiRoundCtes("w1", "w2", "y")}
         SELECT source, CAST(1 AS BIGINT) AS round,
                CAST(loss_ppm AS BIGINT) AS loss_ppm,
                CAST(excess_ppm AS BIGINT) AS excess_ppm,
                CAST(w_ppm AS BIGINT) AS w_ppm
         FROM w1
         UNION ALL
         SELECT source, CAST(2 AS BIGINT) AS round,
                CAST(loss_ppm AS BIGINT) AS loss_ppm,
                CAST(excess_ppm AS BIGINT) AS excess_ppm,
                CAST(w_ppm AS BIGINT) AS w_ppm
         FROM w2""",

    // Mirror of q200: q199's round-2 CTE chain over the FULL corpus,
    // realized onto the hash-half shard — the repeat plan is
    // r_d = w_ppm·1000 // p_d with p_d the SHARD's token share
    // (capped at 8000), then q115's hash-gated epoch expansion with
    // seed 'doremi'. n_copies = 0 docs drop (no floor at 1 epoch —
    // a down-weighted source really does shed documents).
    "q200_doremi_realize" ->
      s"""WITH tok AS (
           SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS t
           FROM documents
         ),
         sb AS (
           SELECT source,
                  ('0x' || substr(md5(t), 1, 15))::BIGINT % 256 AS b,
                  COUNT(1) AS cnt
           FROM tok GROUP BY 1, 2
         ),
         occ AS (SELECT source, SUM(cnt) AS n_occ FROM sb GROUP BY 1),
         w0 AS (
           SELECT source,
                  n_occ * 1000000 // (SELECT SUM(n_occ) FROM occ) AS w_ppm
           FROM occ
         ),
         ${doremiRoundCtes("w0", "w1", "x")},
         ${doremiRoundCtes("w1", "w2", "y")},
         shard AS (
           SELECT * FROM documents
           WHERE ('0x' || substr(md5('shard_' || doc_id), 1, 15))::BIGINT % 2 = 0
         ),
         socc AS (
           SELECT source, COUNT(1) AS n_occ
           FROM (SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS t
                 FROM shard)
           GROUP BY 1
         ),
         plan AS (
           SELECT w2.source,
                  least(8000,
                    (w2.w_ppm * 1000)
                      // GREATEST((o.n_occ * 1000000)
                                    // (SELECT SUM(n_occ) FROM socc), 1)) AS repeat_x1000
           FROM w2 JOIN socc o USING (source)
         ),
         d AS (
           SELECT doc_id, shard.source, repeat_x1000,
                  ('0x' || substr(md5('doremi_' || doc_id), 1, 15))::BIGINT % 1000 AS hv
           FROM shard JOIN plan ON plan.source = shard.source
         ),
         n AS (
           SELECT doc_id, source,
                  CAST(repeat_x1000 // 1000
                    + CASE WHEN hv < repeat_x1000 % 1000 THEN 1 ELSE 0 END AS BIGINT)
                    AS n_copies
           FROM d
         )
         SELECT doc_id, source, CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS epoch
         FROM n WHERE n_copies >= 1""",

    // Mirror of the REAL audio fingerprint chain: the engine encodes
    // WAV containers, decodes actual PCM16, and barcodes the measured
    // frame energies; the oracle recomputes the identical integer
    // barcode from the manifest formula (the q191 round-trip trick).
    "q201_audio_fingerprint" ->
      s"""WITH $audioHashCte
          SELECT doc_id, sh FROM ash""",

    // Near-dup audio pairs over the barcode reps (the q171
    // exact-layer-first discipline): identical barcodes collapse to
    // keep-min reps, exact all-pairs at hamming ≤ 1 — the engine's
    // 8-band pigeonhole is exact to hamming 7, so ground truth and
    // the banded join agree by construction.
    "q202_audio_neardup" ->
      s"""WITH $audioHashCte,
          reps AS (SELECT sh, MIN(doc_id) AS doc_id FROM ash GROUP BY 1)
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
          FROM reps a JOIN reps b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.sh, b.sh)) <= 1""",

    // Mirror of the REAL video chain: the engine builds RIFF/AVI
    // containers with PNG-coded frames, walks the chunks, decodes each
    // frame and measures mean luma from the samples — which the
    // lossless manifest makes exactly Σ((id·31+f·17+x·7+y·13)%256)//48,
    // recomputed here from the formula.
    "q203_video_luma" ->
      s"""WITH $videoLumaCte
          SELECT doc_id, n_frames, frame_idx, mean_luma FROM vml""",

    // Bright-scene segmentation (luma ≥ 128) via the gaps-and-islands
    // key over dense frame indices — the q191 VAD shape on video.
    "q204_video_scenes" ->
      s"""WITH $videoLumaCte,
          a AS (
            SELECT doc_id, n_frames, frame_idx,
                   frame_idx - row_number() OVER (PARTITION BY doc_id
                                                  ORDER BY frame_idx) AS seg
            FROM vml WHERE mean_luma >= 128
          ),
          sg AS (
            SELECT doc_id, n_frames, seg, COUNT(1) AS len
            FROM a GROUP BY 1, 2, 3
          )
          SELECT doc_id, n_frames,
                 COUNT(1) AS n_segments,
                 CAST(SUM(len) AS BIGINT) AS n_active,
                 CAST(MAX(len) AS BIGINT) AS longest_seg,
                 CAST(SUM(len) * 1000000 // n_frames AS BIGINT) AS bright_ppm
          FROM sg GROUP BY doc_id, n_frames""",

    // Mirror of the video barcode: identical thermometer form as the
    // audio one (q201), over the decoded luma envelope.
    "q205_video_fingerprint" ->
      s"""WITH $videoHashCte
          SELECT doc_id, sh FROM vsh""",

    // Near-dup video pairs over barcode reps at hamming ≤ 1 — the
    // q202 discipline on the video modality.
    "q206_video_neardup" ->
      s"""WITH $videoHashCte,
          reps AS (SELECT sh, MIN(doc_id) AS doc_id FROM vsh GROUP BY 1)
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
          FROM reps a JOIN reps b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.sh, b.sh)) <= 1""",

    // q169's verdict-chain oracle (exact connectivity at hamming ≤ 1,
    // survivor = component min, keep/drop_exact/drop_near) over the
    // audio barcodes.
    "q207_audio_verdicts" ->
      s"""WITH RECURSIVE $audioHashCte,
          qpairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM ash a JOIN ash b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sh, b.sh)) <= 1
          ),
          qedges AS (
            SELECT doc_a AS src, doc_b AS dst FROM qpairs
            UNION
            SELECT doc_b, doc_a FROM qpairs
          ),
          qreach AS (
            SELECT DISTINCT src AS doc_id, src AS r FROM qedges
            UNION
            SELECT e.src, r.r FROM qedges e JOIN qreach r ON r.doc_id = e.dst
          ),
          qclus AS (SELECT doc_id, MIN(r) AS cluster_min FROM qreach GROUP BY doc_id),
          qek AS (SELECT sh, MIN(doc_id) AS exact_keeper FROM ash GROUP BY 1),
          qj AS (
            SELECT s.doc_id, qek.exact_keeper, qclus.cluster_min
            FROM ash s JOIN qek USING (sh) LEFT JOIN qclus USING (doc_id)
          )
          SELECT doc_id,
                 COALESCE(cluster_min, exact_keeper) AS survivor_doc_id,
                 CASE WHEN doc_id = COALESCE(cluster_min, exact_keeper) THEN 'keep'
                      WHEN doc_id <> exact_keeper THEN 'drop_exact'
                      ELSE 'drop_near' END AS verdict
          FROM qj""",

    // Same chain over the video barcodes.
    "q208_video_verdicts" ->
      s"""WITH RECURSIVE $videoHashCte,
          qpairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM vsh a JOIN vsh b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sh, b.sh)) <= 1
          ),
          qedges AS (
            SELECT doc_a AS src, doc_b AS dst FROM qpairs
            UNION
            SELECT doc_b, doc_a FROM qpairs
          ),
          qreach AS (
            SELECT DISTINCT src AS doc_id, src AS r FROM qedges
            UNION
            SELECT e.src, r.r FROM qedges e JOIN qreach r ON r.doc_id = e.dst
          ),
          qclus AS (SELECT doc_id, MIN(r) AS cluster_min FROM qreach GROUP BY doc_id),
          qek AS (SELECT sh, MIN(doc_id) AS exact_keeper FROM vsh GROUP BY 1),
          qj AS (
            SELECT s.doc_id, qek.exact_keeper, qclus.cluster_min
            FROM vsh s JOIN qek USING (sh) LEFT JOIN qclus USING (doc_id)
          )
          SELECT doc_id,
                 COALESCE(cluster_min, exact_keeper) AS survivor_doc_id,
                 CASE WHEN doc_id = COALESCE(cluster_min, exact_keeper) THEN 'keep'
                      WHEN doc_id <> exact_keeper THEN 'drop_exact'
                      ELSE 'drop_near' END AS verdict
          FROM qj""",

    // CROSS-MODAL keyframe-vs-image near-dups: keyframe aHashes from
    // the video manifest (every 4th frame of clip id's 8×6 frames,
    // pixel = (id·31 + f·17 + x·7 + y·13) % 256 — the SAME aHash
    // construction as the image CTE, fixed 8×6 dims) joined against
    // the image corpus aHashes at hamming ≤ 1. The engine extracts
    // the PNG stills from real AVI containers and hashes decoded
    // pixels; the oracle recomputes both hash families from the
    // closed-form manifests. Pre-simulated: 1,435 pairs on the
    // 500-doc fixture.
    "q209_crossmodal_neardup" ->
      s"""WITH $aHashCte, $keyframeHashCte
          SELECT k.doc_id AS video_id, k.f AS frame_idx,
                 i.doc_id AS image_id,
                 CAST(bit_count(xor(k.sh, i.sh)) AS INT) AS hamming
          FROM kfh k JOIN shs i ON bit_count(xor(k.sh, i.sh)) <= 1""",

    // Image–text PAIRED-dataset card: the q187 mutual-pair chain over
    // the even/odd modality split, annotated by q137's caption keep
    // set and q169's image dedup keep set, rolled to one row — the
    // full LAION-shape funnel recomputed from first principles.
    "q210_paired_dataset_card" ->
      s"""WITH RECURSIVE $quantCte,
          $kmeansCte,
          $mutualPairCtes,
          $pairGateCtes
          SELECT CAST(COUNT(1) AS BIGINT) AS n_candidate_pairs,
                 CAST(SUM(CASE WHEN cap_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_caption_gated,
                 CAST(SUM(CASE WHEN cap_ok AND img_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
                 CAST(COUNT(DISTINCT CASE WHEN cap_ok AND img_ok THEN a_id END) AS BIGINT) AS n_captions,
                 CAST(COUNT(DISTINCT CASE WHEN cap_ok AND img_ok THEN b_id END) AS BIGINT) AS n_images,
                 CAST(SUM(CASE WHEN cap_ok AND img_ok THEN margin_ppm END) AS BIGINT) AS sum_margin_ppm,
                 CAST(MIN(CASE WHEN cap_ok AND img_ok THEN cos_ppm END) AS BIGINT) AS min_cos_ppm
          FROM ann""",

    // Shared-still groups: keyframe hashes grouped, clip span ≥ 2,
    // keep-min representative decomposed from the packed id.
    "q211_shared_stills" ->
      s"""WITH $keyframeHashCte
          SELECT sh,
                 CAST(COUNT(1) AS BIGINT) AS n_stills,
                 CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_clips,
                 CAST(MIN(doc_id*16 + f) // 16 AS BIGINT) AS keeper_video,
                 CAST(MIN(doc_id*16 + f) % 16 AS BIGINT) AS keeper_frame
          FROM kfh
          GROUP BY sh
          HAVING COUNT(DISTINCT doc_id) >= 2""",

    // Paired-dataset alignment histogram: q210's mutual pairs bucketed
    // by cosine decile with the gated-survivor count per bucket.
    "q212_pair_alignment" ->
      s"""WITH RECURSIVE $quantCte,
          $kmeansCte,
          $mutualPairCtes,
          $pairGateCtes
          SELECT cos_ppm // 100000 AS cos_bucket,
                 CAST(COUNT(1) AS BIGINT) AS n_pairs,
                 CAST(SUM(CASE WHEN cap_ok AND img_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                 CAST(SUM(margin_ppm) AS BIGINT) AS sum_margin_ppm
          FROM ann
          GROUP BY 1""",

    // q209's production reps form: keep-min rep per distinct hash on
    // BOTH sides, then the same hamming ≤ 1 join.
    "q213_crossmodal_reps" ->
      s"""WITH $aHashCte, $keyframeHashCte,
          kreps AS (SELECT sh, MIN(doc_id*16 + f) AS pid FROM kfh GROUP BY 1),
          ireps AS (SELECT sh, MIN(doc_id) AS doc_id FROM shs GROUP BY 1)
          SELECT CAST(k.pid // 16 AS BIGINT) AS video_id,
                 CAST(k.pid % 16 AS BIGINT) AS frame_idx,
                 i.doc_id AS image_id,
                 CAST(bit_count(xor(k.sh, i.sh)) AS INT) AS hamming
          FROM kreps k JOIN ireps i ON bit_count(xor(k.sh, i.sh)) <= 1""",

    // Cross-modal decontamination of the paired dataset: q210's
    // survivors re-derived from first principles, image side probed at
    // the DISTINCT-HASH level against the src0 image manifest at
    // hamming ≤ 1, caption side = eval membership ∪ shared word-5-gram
    // (q58's construction restricted to survivor captions).
    "q214_crossmodal_decontamination" ->
      s"""WITH RECURSIVE $quantCte,
          $kmeansCte,
          $mutualPairCtes,
          $pairGateCtes,
          surv AS (SELECT a_id, b_id FROM ann WHERE cap_ok AND img_ok),
          sih AS (
            SELECT s.doc_id, s.sh FROM shs s
            WHERE s.doc_id IN (SELECT b_id FROM surv)),
          esh AS (
            SELECT DISTINCT sh FROM shs
            WHERE doc_id IN (SELECT doc_id FROM documents WHERE source = 'src0')),
          leakhash AS (
            SELECT DISTINCT a.sh
            FROM (SELECT DISTINCT sh FROM sih) a JOIN esh b
              ON bit_count(xor(a.sh, b.sh)) <= 1),
          imgleak AS (SELECT DISTINCT doc_id FROM sih JOIN leakhash USING (sh)),
          cw AS (
            SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS ws
            FROM documents
            WHERE doc_id IN (SELECT a_id FROM surv) OR source = 'src0'),
          cgr AS (
            SELECT doc_id, source,
                   CASE WHEN len(ws) >= 5
                        THEN list_distinct(list_transform(generate_series(1, len(ws)-4),
                               i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]))
                        ELSE []::VARCHAR[] END AS gs
            FROM cw),
          cex AS (SELECT doc_id, source, unnest(gs) AS s FROM cgr),
          cbg AS (SELECT DISTINCT s FROM cex WHERE source = 'src0'),
          capleak AS (
            SELECT DISTINCT e.doc_id FROM cex e JOIN cbg USING (s)
            WHERE e.doc_id IN (SELECT a_id FROM surv)
            UNION
            SELECT doc_id FROM documents
            WHERE source = 'src0' AND doc_id IN (SELECT a_id FROM surv))
          SELECT s.a_id, s.b_id,
                 (s.a_id IN (SELECT doc_id FROM capleak)) AS cap_leak,
                 (s.b_id IN (SELECT doc_id FROM imgleak)) AS img_leak
          FROM surv s""",

    // Mirror of the REAL audio chain: the engine encodes the
    // closed-form WAV manifest (frames = 3 + id%11, per-frame square
    // wave of amplitude (id·37 + f·101)%1000), decodes actual PCM16
    // bytes back, and measures mean-square frame energy — which the
    // manifest makes EXACTLY amp², so the oracle recomputes it from
    // the formula while the engine derives it from decoded samples.
    // Voiced iff energy >= 250000 (amplitude 500); segments via the
    // gaps-and-islands key (dense frame indices).
    "q191_audio_vad" ->
      """WITH f AS (
           SELECT doc_id,
                  CAST(3 + doc_id % 11 AS BIGINT) AS n_frames,
                  unnest(generate_series(0, CAST(3 + doc_id % 11 AS BIGINT) - 1)) AS frame_idx
           FROM documents
         ),
         a AS (
           SELECT doc_id, n_frames, frame_idx,
                  frame_idx - row_number() OVER (PARTITION BY doc_id
                                                 ORDER BY frame_idx) AS seg
           FROM f
           WHERE ((doc_id * 37 + frame_idx * 101) % 1000)
                 * ((doc_id * 37 + frame_idx * 101) % 1000) >= 250000
         ),
         sg AS (
           SELECT doc_id, n_frames, seg, COUNT(1) AS len
           FROM a GROUP BY 1, 2, 3
         )
         SELECT doc_id, n_frames,
                COUNT(1) AS n_segments,
                CAST(SUM(len) AS BIGINT) AS n_active,
                CAST(MAX(len) AS BIGINT) AS longest_seg,
                CAST(SUM(len) * 1000000 // n_frames AS BIGINT) AS voiced_ppm
         FROM sg GROUP BY doc_id, n_frames""",

    // Mirror of q192: the q185 hashed scorer, density shifted +1000
    // (non-negative numerator, so // == Spark's div), running token
    // sum over the total (density DESC, doc_id) order — DuckDB may
    // use the single-reducer window; the engine must not.
    "q192_budget_selection" ->
      s"""WITH $wordsCte,
         occ AS (
           SELECT doc_id,
                  ('0x' || substr(md5('qw_' ||
                      (('0x' || substr(md5(t), 1, 15))::BIGINT % 1024)), 1, 15))::BIGINT
                    % 2001 - 1000 AS w_milli
           FROM (SELECT doc_id, unnest(ws) AS t FROM words)
         ),
         per AS (
           SELECT doc_id, COUNT(1) AS n_tokens,
                  CAST(SUM(w_milli) AS BIGINT) AS logit_milli
           FROM occ GROUP BY doc_id
         ),
         d AS (
           SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                  CAST((logit_milli + 1000 * n_tokens) // n_tokens AS BIGINT)
                    AS density_q_milli
           FROM per
         )
         SELECT doc_id, n_tokens, density_q_milli,
                CAST(SUM(n_tokens) OVER w AS BIGINT) AS running_total,
                SUM(n_tokens) OVER w <= 10000 AS admitted
         FROM d
         WINDOW w AS (ORDER BY density_q_milli DESC, doc_id ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",

    // Mirror of Profile.ddQuantileAudit (k = 4): integer base-2
    // DDSketch buckets — e = length(bin(v)) - 1 (minimal-width binary
    // in both engines), key = e·16 + (v >> max(e-4,0)) - 2^min(e,4),
    // rep/hi recomputed from the key; ⌈p·n⌉ picks on both the sketch
    // and exact cumulative relations.
    "q193_dd_quantiles" ->
      """WITH h AS (
           SELECT source AS g,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS v,
                  COUNT(1) AS cnt
           FROM documents GROUP BY 1, 2
         ),
         kx AS (SELECT g, v, cnt, length(bin(v)) - 1 AS e FROM h),
         sb AS (
           SELECT g,
                  CAST(e * 16 + (v >> greatest(e - 4, 0))
                       - (1::BIGINT << least(e, 4)) AS BIGINT) AS key,
                  SUM(cnt) AS cnt
           FROM kx GROUP BY 1, 2
         ),
         skc AS (
           SELECT g, key, cnt,
                  SUM(cnt) OVER (PARTITION BY g ORDER BY key
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                  SUM(cnt) OVER (PARTITION BY g) AS tot
           FROM sb
         ),
         skv AS (
           SELECT g, cum, tot,
                  CAST(((1::BIGINT << least(e, 4)) + m) << greatest(e - 4, 0) AS BIGINT) AS rep,
                  CAST((((1::BIGINT << least(e, 4)) + m) << greatest(e - 4, 0))
                       + (1::BIGINT << greatest(e - 4, 0)) - 1 AS BIGINT) AS hi
           FROM (SELECT *, CAST(key >> 4 AS BIGINT) AS e, CAST(key & 15 AS BIGINT) AS m
                 FROM skc)
         ),
         exc AS (
           SELECT g, v,
                  SUM(cnt) OVER (PARTITION BY g ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                  SUM(cnt) OVER (PARTITION BY g) AS tot
           FROM h
         ),
         sq AS (
           SELECT g, CAST(MAX(tot) AS BIGINT) AS n,
                  MIN(CASE WHEN cum >= (tot * 50 + 99) // 100 THEN rep END) AS p50_rep,
                  MIN(CASE WHEN cum >= (tot * 50 + 99) // 100 THEN hi END) AS p50_hi,
                  MIN(CASE WHEN cum >= (tot * 90 + 99) // 100 THEN rep END) AS p90_rep,
                  MIN(CASE WHEN cum >= (tot * 90 + 99) // 100 THEN hi END) AS p90_hi,
                  MIN(CASE WHEN cum >= (tot * 99 + 99) // 100 THEN rep END) AS p99_rep,
                  MIN(CASE WHEN cum >= (tot * 99 + 99) // 100 THEN hi END) AS p99_hi
           FROM skv GROUP BY g
         ),
         eq AS (
           SELECT g,
                  MIN(CASE WHEN cum >= (tot * 50 + 99) // 100 THEN v END) AS p50_exact,
                  MIN(CASE WHEN cum >= (tot * 90 + 99) // 100 THEN v END) AS p90_exact,
                  MIN(CASE WHEN cum >= (tot * 99 + 99) // 100 THEN v END) AS p99_exact
           FROM exc GROUP BY g
         )
         SELECT sq.g AS source, n,
                p50_rep, p50_exact,
                p50_rep <= p50_exact AND p50_exact <= p50_hi AS p50_ok,
                p90_rep, p90_exact,
                p90_rep <= p90_exact AND p90_exact <= p90_hi AS p90_ok,
                p99_rep, p99_exact,
                p99_rep <= p99_exact AND p99_exact <= p99_hi AS p99_ok
         FROM sq JOIN eq USING (g)""",

    // Mirror of Packing.fimSplit: hash-gated 50% FIM rate, per-doc
    // uniform character split points from the portable hash, PSM
    // rewrite via substr (both engines count characters).
    "q194_fim_split" ->
      """WITH b AS (
           SELECT doc_id, text AS t, CAST(length(text) AS BIGINT) AS n_chars,
                  ('0x' || substr(md5('fim_' || doc_id), 1, 15))::BIGINT % 10000 < 5000 AS fim,
                  ('0x' || substr(md5('fim1_' || doc_id), 1, 15))::BIGINT
                    % (length(text) + 1) AS c1,
                  ('0x' || substr(md5('fim2_' || doc_id), 1, 15))::BIGINT
                    % (length(text) + 1) AS c2
           FROM documents
         ),
         p AS (
           SELECT doc_id, t, n_chars, fim,
                  CASE WHEN fim THEN least(c1, c2) END AS p_lo,
                  CASE WHEN fim THEN greatest(c1, c2) END AS p_hi
           FROM b
         )
         SELECT doc_id, n_chars, fim, p_lo, p_hi,
                CASE WHEN fim THEN
                  '<PRE>' || substr(t, 1, CAST(p_lo AS INT))
                  || '<SUF>' || substr(t, CAST(p_hi AS INT) + 1)
                  || '<MID>' || substr(t, CAST(p_lo AS INT) + 1, CAST(p_hi - p_lo AS INT))
                ELSE t END AS fim_text
         FROM p""",

    // Mirror of q195: quality rank (q185 hashed density, +1000
    // shift) vs DSIR rank (q97 CTEs verbatim), each over its own full
    // domain, |Δrank| top-50 with doc_id tiebreak.
    "q195_rank_disagreement" ->
      s"""WITH $wordsCte,
         qocc AS (
           SELECT doc_id,
                  ('0x' || substr(md5('qw_' ||
                      (('0x' || substr(md5(t), 1, 15))::BIGINT % 1024)), 1, 15))::BIGINT
                    % 2001 - 1000 AS w_milli
           FROM (SELECT doc_id, unnest(ws) AS t FROM words)
         ),
         qper AS (
           SELECT doc_id, COUNT(1) AS n_tokens,
                  CAST(SUM(w_milli) AS BIGINT) AS logit_milli
           FROM qocc GROUP BY doc_id
         ),
         rq AS (
           SELECT doc_id,
                  row_number() OVER (
                    ORDER BY (logit_milli + 1000 * n_tokens) // n_tokens DESC,
                             doc_id ASC) AS r_quality
           FROM qper
         ),
         dw AS (
           SELECT doc_id, source = 'src1' AS is_target,
                  string_split_regex(trim(text), '\\s+') AS ws
           FROM documents
         ),
         df_ AS (
           SELECT doc_id, is_target,
                  unnest(list_transform(generate_series(2, len(ws)),
                                        i -> ws[i-1] || '_' || ws[i])) AS f
           FROM dw WHERE len(ws) >= 2
         ),
         docc AS (
           SELECT doc_id, is_target,
                  ('0x' || substr(md5(f), 1, 15))::BIGINT % 256 AS b
           FROM df_
         ),
         dct AS (SELECT b, COUNT(1) AS c FROM docc WHERE is_target GROUP BY 1),
         dcr AS (SELECT b, COUNT(1) AS c FROM docc GROUP BY 1),
         dtt AS (SELECT COALESCE(SUM(c), 0) AS v FROM dct),
         dtr AS (SELECT COALESCE(SUM(c), 0) AS v FROM dcr),
         ddict AS (
           SELECT dcr.b,
                  ((COALESCE(dct.c, 0) + 1) * 1000000) // (dtt.v + 256) AS pt_ppm,
                  ((dcr.c + 1) * 1000000) // (dtr.v + 256) AS pr_ppm
           FROM dcr LEFT JOIN dct USING (b), dtt, dtr
         ),
         dscore AS (
           SELECT o.doc_id,
                  CAST((SUM(d.pt_ppm) * 1000000)
                       // GREATEST(SUM(d.pr_ppm), 1) AS BIGINT) AS dsir_ppm
           FROM docc o JOIN ddict d USING (b)
           GROUP BY o.doc_id
         ),
         rd AS (
           SELECT doc_id,
                  row_number() OVER (ORDER BY dsir_ppm DESC, doc_id ASC) AS r_dsir
           FROM dscore
         )
         SELECT rq.doc_id,
                CAST(r_quality AS BIGINT) AS r_quality,
                CAST(r_dsir AS BIGINT) AS r_dsir,
                CAST(abs(r_quality - r_dsir) AS BIGINT) AS rank_gap
         FROM rq JOIN rd USING (doc_id)
         ORDER BY rank_gap DESC, rq.doc_id ASC LIMIT 50""",

    "q85_prep_pipeline" ->
      s"""WITH RECURSIVE $verdictCtes,
          keep AS (
            SELECT doc_id FROM j WHERE doc_id = COALESCE(cluster_min, exact_keeper)
          ),
          nb AS (
            SELECT d.doc_id, d.text, d.source, d.n_chars
            FROM documents d JOIN keep USING (doc_id)
            WHERE d.source <> 'src0'
          ),
          grn AS (
            SELECT doc_id, source, n_chars, string_split_regex(trim(text), '\\s+') AS ws FROM nb
          ),
          gr5 AS (
            SELECT doc_id,
                   CASE WHEN len(ws) >= 5
                        THEN list_distinct(list_transform(generate_series(1, len(ws)-4),
                               i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]))
                        ELSE []::VARCHAR[] END AS gs
            FROM grn
          ),
          exg AS (SELECT doc_id, unnest(gs) AS s FROM gr5),
          bw AS (
            SELECT string_split_regex(trim(text), '\\s+') AS ws FROM documents WHERE source = 'src0'
          ),
          bgr AS (
            SELECT DISTINCT unnest(
              CASE WHEN len(ws) >= 5
                   THEN list_distinct(list_transform(generate_series(1, len(ws)-4),
                          i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]))
                   ELSE []::VARCHAR[] END) AS s
            FROM bw
          ),
          contam AS (SELECT DISTINCT e.doc_id FROM exg e JOIN bgr ON e.s = bgr.s),
          k2 AS (
            SELECT nb.* FROM nb WHERE NOT EXISTS (SELECT 1 FROM contam c WHERE c.doc_id = nb.doc_id)
          ),
          cnts AS (SELECT source, COUNT(1) AS n FROM k2 GROUP BY source),
          mn AS (SELECT MIN(n) AS nmin FROM cnts),
          rates AS (
            SELECT source,
                   GREATEST(1, CAST(round(sqrt(CAST(nmin AS DOUBLE) / n) * 10000) AS BIGINT)) AS bps
            FROM cnts, mn
          ),
          k3 AS (
            SELECT k2.source, k2.n_chars FROM k2 JOIN rates USING (source)
            WHERE ('0x' || substr(md5('prep_' || doc_id), 1, 15))::BIGINT % 10000 < rates.bps
          )
          SELECT source, COUNT(1) AS n_docs,
                 CAST(SUM(CAST(n_chars AS DECIMAL(28,4))) AS DOUBLE) AS sum_chars
          FROM k3 GROUP BY source""",

    "q84_lsh_rescored" ->
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
          est AS (
            SELECT c.da, c.db
            FROM cand c
            JOIN sig sa ON sa.doc_id = c.da
            JOIN sig sb ON sb.doc_id = c.db AND sb.k = sa.k
            GROUP BY 1, 2
            HAVING COUNT(CASE WHEN sa.minhash = sb.minhash THEN 1 END) / 16.0 >= 0.5
          ),
          sizes AS (SELECT doc_id, COUNT(1) AS n FROM sh GROUP BY 1),
          inter AS (
            SELECT e.da, e.db, COUNT(1) AS i
            FROM est e
            JOIN sh a ON a.doc_id = e.da
            JOIN sh b ON b.doc_id = e.db AND b.s = a.s
            GROUP BY 1, 2
          )
          SELECT i2.da AS doc_a, i2.db AS doc_b,
                 CAST(i2.i AS DOUBLE) / (sa.n + sb.n - i2.i) AS jaccard
          FROM inter i2
          JOIN sizes sa ON sa.doc_id = i2.da
          JOIN sizes sb ON sb.doc_id = i2.db
          WHERE CAST(i2.i AS DOUBLE) / (sa.n + sb.n - i2.i) >= 0.8""",

    "q76_lm_score" ->
      s"""WITH $wordsCte,
          t AS (SELECT doc_id, generate_subscripts(ws, 1) AS i, unnest(ws) AS w FROM words),
          bg0 AS (
            SELECT doc_id, w AS w1,
                   lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
            FROM t
          ),
          bg AS (SELECT doc_id, w1, w2 FROM bg0 WHERE w2 IS NOT NULL),
          cb AS (SELECT w1, w2, COUNT(1) AS c2 FROM bg GROUP BY 1, 2),
          cu AS (SELECT w1, SUM(c2) AS c1 FROM cb GROUP BY 1),
          pr AS (SELECT w1, w2, (c2 * 1000000) // c1 AS p_ppm FROM cb JOIN cu USING (w1))
          SELECT bg.doc_id, COUNT(1) AS n_bigrams,
                 CAST(SUM(p.p_ppm) AS DOUBLE) / COUNT(1) AS avg_p_ppm,
                 CAST(MIN(p.p_ppm) AS BIGINT) AS min_p_ppm
          FROM bg JOIN pr p USING (w1, w2)
          GROUP BY bg.doc_id""",

    // SemDeDup over the trained codebook: assignment = q61's argmax,
    // then within-cell pairwise cosine ≥ 0.4 against lower ids.
    "q96_semdedup" ->
      s"""WITH $quantCte,
          $kmeansCte,
          cc2 AS (
            SELECT en.vec_id, c.cell,
                   ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
            FROM en, cn c
          ),
          asg AS (
            SELECT vec_id, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc2) WHERE rn = 1
          ),
          m AS (SELECT en.vec_id, en.v, en.n2, asg.cell FROM en JOIN asg USING (vec_id)),
          sc AS (
            SELECT a.vec_id AS vec_id, b.vec_id AS bid,
                   ${cosSql("a.v", "b.v", "a.n2", "b.n2")} AS cos
            FROM m a JOIN m b ON a.cell = b.cell AND a.vec_id > b.vec_id
          ),
          p AS (
            SELECT vec_id, MIN(bid) AS survivor_id, MAX(cos) AS max_cos
            FROM sc WHERE cos >= 0.4 GROUP BY 1
          )
          SELECT m.vec_id, m.cell AS cluster_id,
                 CASE WHEN p.vec_id IS NULL THEN 'keep' ELSE 'drop_semantic' END AS verdict,
                 p.survivor_id, p.max_cos
          FROM m LEFT JOIN p ON p.vec_id = m.vec_id""",

    // DSIR weights: hashed-bigram cells (md5-60bit % 256, the
    // portable-hash convention), Laplace-smoothed ppm distributions,
    // floor-division score ratio — integer-exact on both engines.
    "q97_dsir_weights" ->
      """WITH w AS (
           SELECT doc_id, source = 'src1' AS is_target,
                  string_split_regex(trim(text), '\s+') AS ws
           FROM documents
         ),
         f AS (
           SELECT doc_id, is_target,
                  unnest(list_transform(generate_series(2, len(ws)),
                                        i -> ws[i-1] || '_' || ws[i])) AS f
           FROM w WHERE len(ws) >= 2
         ),
         occ AS (
           SELECT doc_id, is_target,
                  ('0x' || substr(md5(f), 1, 15))::BIGINT % 256 AS b
           FROM f
         ),
         ct AS (SELECT b, COUNT(1) AS c FROM occ WHERE is_target GROUP BY 1),
         cr AS (SELECT b, COUNT(1) AS c FROM occ GROUP BY 1),
         tt AS (SELECT COALESCE(SUM(c), 0) AS v FROM ct),
         tr AS (SELECT COALESCE(SUM(c), 0) AS v FROM cr),
         dict AS (
           SELECT cr.b,
                  ((COALESCE(ct.c, 0) + 1) * 1000000) // (tt.v + 256) AS pt_ppm,
                  ((cr.c + 1) * 1000000) // (tr.v + 256) AS pr_ppm
           FROM cr LEFT JOIN ct USING (b), tt, tr
         )
         SELECT o.doc_id, o.is_target, COUNT(1) AS n_feats,
                CAST(SUM(d.pt_ppm) AS BIGINT) AS sum_target_ppm,
                CAST(SUM(d.pr_ppm) AS BIGINT) AS sum_raw_ppm,
                CAST((SUM(d.pt_ppm) * 1000000)
                     // GREATEST(SUM(d.pr_ppm), 1) AS BIGINT) AS dsir_ppm
         FROM occ o JOIN dict d USING (b)
         GROUP BY 1, 2""",

    // Per-source drift: integer-ppm unigram distributions, L1 over the
    // vocab × sources grid, rank-1 most-divergent token per source.
    "q98_source_drift" ->
      """WITH tok AS (
           SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS t
           FROM documents
         ),
         cgt AS (SELECT source, t, COUNT(1) AS c_gt FROM tok GROUP BY 1, 2),
         totg AS (SELECT source, CAST(SUM(c_gt) AS BIGINT) AS n_tokens
                  FROM cgt GROUP BY 1),
         ct AS (SELECT t, SUM(c_gt) AS c_t FROM cgt GROUP BY 1),
         tot AS (SELECT SUM(c_t) AS v FROM ct),
         grid AS (
           SELECT g.source, ct.t, c.c_gt,
                  (COALESCE(c.c_gt, 0) * 1000000) // g.n_tokens AS pg,
                  (ct.c_t * 1000000) // tot.v AS pc
           FROM totg g CROSS JOIN ct CROSS JOIN tot
           LEFT JOIN cgt c ON c.source = g.source AND c.t = ct.t
         ),
         stats AS (
           SELECT source, COUNT(c_gt) AS n_distinct_tokens,
                  CAST(SUM(ABS(pg - pc)) AS BIGINT) AS l1_ppm
           FROM grid GROUP BY 1
         ),
         top AS (
           SELECT source, t AS top_token,
                  CAST(ABS(pg - pc) AS BIGINT) AS top_gap_ppm,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY ABS(pg - pc) DESC, t ASC) AS rn
           FROM grid
         )
         SELECT g.source, g.n_tokens, s.n_distinct_tokens, s.l1_ppm,
                top.top_token, top.top_gap_ppm
         FROM totg g
         JOIN stats s USING (source)
         JOIN top ON top.source = g.source AND top.rn = 1""",

    // Prefix-filter join is EXACT: the oracle is the plain uncapped
    // posting-list Jaccard — same output, different (scale-safe) plan.
    "q99_prefix_jaccard" ->
      s"""WITH $shinglesCte,
          sizes AS (SELECT doc_id, COUNT(1) AS n FROM sh GROUP BY 1),
          inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(1) AS i
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
          )
          SELECT da AS doc_a, db AS doc_b,
                 CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
          FROM inter
          JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
          WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8""",

    "q101_pq_codes" ->
      s"""WITH $quantCte,
          $pqCte
          SELECT vec_id, CAST(sub AS INT) AS sub, code, d2 FROM pcodes""",

    "q102_pq_topk" ->
      s"""WITH $quantCte,
          $pqCte,
          dt AS (
            SELECT vec_id AS qid, sub, cell AS code, d2 AS qd2
            FROM pd2 WHERE vec_id IN (0, 1, 2, 3, 4)
          ),
          sc AS (
            SELECT dt.qid, p.vec_id AS cid, CAST(SUM(dt.qd2) AS BIGINT) AS adc_dist2
            FROM pcodes p JOIN dt ON dt.sub = p.sub AND dt.code = p.code
            WHERE p.vec_id <> dt.qid
            GROUP BY 1, 2
          ),
          r AS (
            SELECT qid, cid, adc_dist2,
                   row_number() OVER (PARTITION BY qid ORDER BY adc_dist2 ASC, cid ASC) AS rk
            FROM sc
          )
          SELECT qid, cid, adc_dist2, rk FROM r WHERE rk <= 5""",

    "q107_chunking" ->
      """WITH w AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents
         ),
         st AS (
           SELECT doc_id, ws,
                  unnest(generate_series(0, greatest(len(ws) - 1, 0), 48)) AS start
           FROM w
         ),
         ch AS (
           SELECT doc_id, start // 48 AS chunk_idx,
                  ws[start + 1 : start + 64] AS chunk
           FROM st
         )
         SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
                CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
                array_to_string(chunk, ' ') AS chunk_text,
                md5(array_to_string(chunk, ' ')) AS chunk_md5
         FROM ch""",

    "q108_global_shuffle" ->
      """WITH k AS (
           SELECT doc_id,
                  ('0x' || substr(md5('shuf_' || doc_id), 1, 15))::BIGINT AS shuffle_key
           FROM documents
         )
         SELECT doc_id, shuffle_key, shuffle_key % 8 AS shard,
                CAST(row_number() OVER (PARTITION BY shuffle_key % 8
                                        ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos
         FROM k""",

    "q109_length_quantiles" ->
      """WITH h AS (
           SELECT source AS "group", n_chars AS len, CAST(COUNT(1) AS BIGINT) AS cnt
           FROM documents GROUP BY 1, 2
         ),
         c AS (
           SELECT "group", len, cnt,
                  CAST(SUM(cnt) OVER (PARTITION BY "group" ORDER BY len) AS BIGINT) AS cum,
                  CAST(SUM(cnt) OVER (PARTITION BY "group") AS BIGINT) AS tot
           FROM h
         )
         SELECT "group", MAX(tot) AS n, MIN(len) AS min_len,
                MIN(CASE WHEN cum >= (tot * 25 + 99) // 100 THEN len END) AS p25,
                MIN(CASE WHEN cum >= (tot * 50 + 99) // 100 THEN len END) AS p50,
                MIN(CASE WHEN cum >= (tot * 90 + 99) // 100 THEN len END) AS p90,
                MIN(CASE WHEN cum >= (tot * 99 + 99) // 100 THEN len END) AS p99,
                MAX(len) AS max_len
         FROM c GROUP BY 1""",

    "q110_mixture_plan" ->
      """WITH c AS (
           SELECT source, CAST(COUNT(1) AS BIGINT) AS n_docs,
                  CAST(round(sqrt(CAST(COUNT(1) AS DOUBLE)) * 1000000) AS BIGINT) AS sq
           FROM documents GROUP BY 1
         ),
         t AS (
           SELECT CAST(SUM(n_docs) AS BIGINT) AS tot, CAST(SUM(sq) AS BIGINT) AS sqtot FROM c
         ),
         p AS (
           SELECT source, n_docs,
                  (n_docs * 1000000) // tot AS natural_ppm,
                  (sq * 1000000) // sqtot AS target_ppm
           FROM c, t
         ),
         r AS (
           SELECT *, least(8000, greatest(1000, (target_ppm * 1000) // greatest(natural_ppm, 1)))
                       AS repeat_x1000
           FROM p
         )
         SELECT source, n_docs, natural_ppm, target_ppm, repeat_x1000,
                (n_docs * repeat_x1000) // 1000 AS effective_docs
         FROM r""",

    "q111_semantic_decontamination" ->
      s"""WITH e AS (
            SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS v
            FROM embeddings
          ),
          en AS (
            SELECT vec_id, label, v,
                   CAST(list_aggregate(list_transform(v, x -> x*x), 'sum') AS BIGINT) AS n2
            FROM e
          ),
          b AS (SELECT v AS bv, n2 AS bn2 FROM en WHERE label = 0),
          c AS (SELECT vec_id, label, v, n2 FROM en WHERE label <> 0),
          s AS (
            SELECT c.vec_id, c.label,
                   MAX(${cosSql("c.v", "b.bv", "c.n2", "b.bn2")}) AS max_benchmark_cos
            FROM c, b GROUP BY 1, 2
          )
          SELECT vec_id, label, max_benchmark_cos,
                 max_benchmark_cos >= CAST(0.35 AS DOUBLE) AS contaminated
          FROM s""",

    // Truth side = q99's oracle (uncapped posting-list Jaccard);
    // candidate side = q84's oracle (band join → estimate gate →
    // exact rescore); the audit is the full-outer count rollup.
    "q112_lsh_recall_audit" ->
      s"""WITH $sigCte,
          sizes AS (SELECT doc_id, COUNT(1) AS n FROM sh GROUP BY 1),
          tinter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(1) AS i
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
          ),
          truth AS (
            SELECT da, db FROM tinter
            JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
          ),
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
          est AS (
            SELECT c.da, c.db
            FROM cand c
            JOIN sig sa ON sa.doc_id = c.da
            JOIN sig sb ON sb.doc_id = c.db AND sb.k = sa.k
            GROUP BY 1, 2
            HAVING COUNT(CASE WHEN sa.minhash = sb.minhash THEN 1 END) / 16.0 >= 0.5
          ),
          linter AS (
            SELECT e.da, e.db, COUNT(1) AS i
            FROM est e
            JOIN sh a ON a.doc_id = e.da
            JOIN sh b ON b.doc_id = e.db AND b.s = a.s
            GROUP BY 1, 2
          ),
          lsh AS (
            SELECT l.da, l.db FROM linter l
            JOIN sizes sa ON sa.doc_id = l.da JOIN sizes sb ON sb.doc_id = l.db
            WHERE CAST(l.i AS DOUBLE) / (sa.n + sb.n - l.i) >= 0.8
          ),
          j AS (
            SELECT CAST(COUNT(CASE WHEN t.da IS NOT NULL AND l.da IS NOT NULL THEN 1 END) AS BIGINT) AS tp,
                   CAST(COUNT(CASE WHEN t.da IS NOT NULL AND l.da IS NULL THEN 1 END) AS BIGINT) AS fn,
                   CAST(COUNT(CASE WHEN t.da IS NULL AND l.da IS NOT NULL THEN 1 END) AS BIGINT) AS fp
            FROM truth t FULL OUTER JOIN lsh l ON t.da = l.da AND t.db = l.db
          )
          SELECT tp + fn AS n_truth, tp + fp AS n_candidate, tp, fn, fp,
                 (tp * 1000000) // greatest(tp + fn, 1) AS recall_ppm,
                 (tp * 1000000) // greatest(tp + fp, 1) AS precision_ppm
          FROM j""",

    "q113_vocab_coverage" ->
      """WITH toks AS (
           SELECT unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents
         ),
         counts AS (SELECT t, CAST(COUNT(1) AS BIGINT) AS occ FROM toks GROUP BY 1),
         ranked AS (
           SELECT occ, row_number() OVER (ORDER BY occ DESC, t ASC) AS rnk FROM counts
         ),
         tot AS (
           SELECT CAST(COUNT(1) AS BIGINT) AS vocab_size,
                  CAST(SUM(occ) AS BIGINT) AS total_occurrences
           FROM counts
         ),
         cov AS (
           SELECT ks.k,
                  CAST(coalesce(SUM(CASE WHEN rnk <= ks.k THEN occ END), 0) AS BIGINT) AS covered_occurrences
           FROM ranked CROSS JOIN (VALUES (10), (100), (1000)) ks(k)
           GROUP BY 1
         )
         SELECT CAST(k AS INT) AS k, vocab_size, total_occurrences, covered_occurrences,
                (covered_occurrences * 1000000) // greatest(total_occurrences, 1) AS coverage_ppm
         FROM cov, tot""",

    "q114_perplexity_buckets" ->
      s"""WITH $wordsCte,
          t AS (SELECT doc_id, generate_subscripts(ws, 1) AS i, unnest(ws) AS w FROM words),
          bg0 AS (
            SELECT doc_id, w AS w1,
                   lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
            FROM t
          ),
          bg AS (SELECT doc_id, w1, w2 FROM bg0 WHERE w2 IS NOT NULL),
          cb AS (SELECT w1, w2, COUNT(1) AS c2 FROM bg GROUP BY 1, 2),
          cu AS (SELECT w1, SUM(c2) AS c1 FROM cb GROUP BY 1),
          pr AS (SELECT w1, w2, (c2 * 1000000) // c1 AS p_ppm FROM cb JOIN cu USING (w1)),
          scored AS (
            SELECT bg.doc_id, CAST(SUM(p.p_ppm) AS DOUBLE) / COUNT(1) AS avg_p_ppm
            FROM bg JOIN pr p USING (w1, w2)
            GROUP BY bg.doc_id
          ),
          b AS (
            SELECT doc_id, avg_p_ppm,
                   CAST(ntile(3) OVER (ORDER BY avg_p_ppm DESC, doc_id ASC) AS INT) AS tile
            FROM scored
          )
          SELECT doc_id, avg_p_ppm, tile,
                 CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
          FROM b""",

    "q115_realized_epochs" ->
      """WITH c AS (
           SELECT source, CAST(COUNT(1) AS BIGINT) AS n_docs,
                  CAST(round(sqrt(CAST(COUNT(1) AS DOUBLE)) * 1000000) AS BIGINT) AS sq
           FROM documents GROUP BY 1
         ),
         t AS (
           SELECT CAST(SUM(n_docs) AS BIGINT) AS tot, CAST(SUM(sq) AS BIGINT) AS sqtot FROM c
         ),
         plan AS (
           SELECT source,
                  least(8000, greatest(1000,
                    (((sq * 1000000) // sqtot) * 1000)
                      // greatest((n_docs * 1000000) // tot, 1))) AS repeat_x1000
           FROM c, t
         ),
         d AS (
           SELECT doc_id, documents.source, repeat_x1000,
                  ('0x' || substr(md5('epoch_' || doc_id), 1, 15))::BIGINT % 1000 AS hv
           FROM documents JOIN plan ON plan.source = documents.source
         ),
         n AS (
           SELECT doc_id, source,
                  repeat_x1000 // 1000
                    + CASE WHEN hv < repeat_x1000 % 1000 THEN 1 ELSE 0 END AS n_copies
           FROM d
         )
         SELECT doc_id, source, CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS epoch
         FROM n""",

    // Text side = q73's BM25 CTE chain (top-20); vector side = q36's
    // cosine top-10 per query; fusion = integer-ppm RRF on ranks.
    "q116_hybrid_rrf" ->
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
          ),
          text20 AS (
            SELECT doc_id,
                   COALESCE(s0, 0.0) + COALESCE(s1, 0.0) + COALESCE(s2, 0.0)
                     + COALESCE(s3, 0.0) + COALESCE(s4, 0.0) AS score
            FROM g ORDER BY score DESC, doc_id LIMIT 20
          ),
          textr AS (
            SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank_text
            FROM text20
          ),
          $quantCte,
          q AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2 FROM en WHERE vec_id IN (0,1,2,3,4)),
          vscored AS (
            SELECT q.qid, c.vec_id AS cid,
                   ${cosSql("q.qv", "c.v", "q.qn2", "c.n2")} AS cosine
            FROM en c, q WHERE c.vec_id <> q.qid
          ),
          vecr AS (
            SELECT qid, cid AS doc_id, rk AS rank_vec FROM (
              SELECT qid, cid, cosine,
                     row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
              FROM vscored) WHERE rk <= 10
          ),
          tq AS (SELECT qs.qid, textr.doc_id, textr.rank_text
                 FROM (SELECT DISTINCT qid FROM vecr) qs, textr),
          f AS (
            SELECT COALESCE(tq.qid, v.qid) AS qid,
                   COALESCE(tq.doc_id, v.doc_id) AS doc_id,
                   CAST(COALESCE(1000000 // (60 + tq.rank_text), 0)
                     + COALESCE(1000000 // (60 + v.rank_vec), 0) AS BIGINT) AS rrf_ppm
            FROM tq FULL OUTER JOIN vecr v ON tq.qid = v.qid AND tq.doc_id = v.doc_id
          )
          SELECT qid, doc_id, rrf_ppm, CAST(rk AS BIGINT) AS rk FROM (
            SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rrf_ppm DESC, doc_id ASC) AS rk
            FROM f) WHERE rk <= 10""",

    "q117_char_stats" ->
      """WITH ch AS (
           SELECT doc_id, unnest(string_split(text, '')) AS c
           FROM documents WHERE length(text) > 0
         ),
         cc AS (SELECT doc_id, c, CAST(COUNT(1) AS BIGINT) AS k FROM ch GROUP BY 1, 2),
         agg AS (
           SELECT doc_id,
                  CAST(SUM(k) AS BIGINT) AS n_chars,
                  CAST(COUNT(1) AS INT) AS distinct_chars,
                  SUM(k * (k - 1)) AS coll
           FROM cc GROUP BY 1
         )
         SELECT d.doc_id,
                CAST(COALESCE(a.n_chars, 0) AS BIGINT) AS n_chars,
                CAST(COALESCE(a.distinct_chars, 0) AS INT) AS distinct_chars,
                CASE WHEN a.n_chars >= 2
                     THEN CAST((a.coll * 1000000) // (a.n_chars * (a.n_chars - 1)) AS BIGINT)
                END AS char_coll_ppm
         FROM documents d LEFT JOIN agg a USING (doc_id)""",

    "q118_truncation_loss" ->
      """WITH t AS (
           SELECT source,
                  CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nt
           FROM documents
         )
         SELECT source,
                CAST(COUNT(1) AS BIGINT) AS n_docs,
                CAST(SUM(nt) AS BIGINT) AS total_tokens,
                CAST(SUM(CASE WHEN nt > 64 THEN 1 ELSE 0 END) AS BIGINT) AS truncated_docs,
                CAST(SUM(CASE WHEN nt > 64 THEN nt - 64 ELSE 0 END) AS BIGINT) AS lost_tokens,
                CASE WHEN SUM(nt) > 0
                     THEN CAST((SUM(CASE WHEN nt > 64 THEN nt - 64 ELSE 0 END) * 1000000)
                               // SUM(nt) AS BIGINT)
                END AS lost_ppm
         FROM t GROUP BY source""",

    "q119_dedup_token_yield" ->
      """WITH b AS (
           SELECT doc_id, source,
                  md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS fp,
                  CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nt
           FROM documents
         ),
         k AS (SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS keeper FROM b)
         SELECT source,
                CAST(COUNT(1) AS BIGINT) AS n_docs,
                CAST(SUM(nt) AS BIGINT) AS total_tokens,
                CAST(SUM(CASE WHEN doc_id = keeper THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
                CAST(SUM(CASE WHEN doc_id = keeper THEN nt ELSE 0 END) AS BIGINT) AS kept_tokens,
                CASE WHEN SUM(nt) > 0
                     THEN CAST(((SUM(nt) - SUM(CASE WHEN doc_id = keeper THEN nt ELSE 0 END)) * 1000000)
                               // SUM(nt) AS BIGINT)
                END AS dup_token_ppm
         FROM k GROUP BY source""",

    "q120_hard_negatives" ->
      s"""WITH $quantCte,
          el AS (SELECT en.vec_id, v, n2, label FROM en JOIN embeddings USING (vec_id)),
          q AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2, label AS ql
                FROM el WHERE vec_id IN (0,1,2,3,4)),
          scored AS (
            SELECT q.qid, c.vec_id AS cid, c.label AS neg_label,
                   ${cosSql("q.qv", "c.v", "q.qn2", "c.n2")} AS cosine
            FROM el c, q
            WHERE c.vec_id <> q.qid AND c.label IS DISTINCT FROM q.ql
          ),
          r AS (SELECT qid, cid, neg_label, cosine,
                       row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
                FROM scored)
          SELECT qid, cid, neg_label, cosine, CAST(rk AS INT) AS rk FROM r WHERE rk <= 10""",

    "q121_epoch_keepers" ->
      """WITH b AS (
           SELECT doc_id,
                  md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS fp
           FROM documents
         ),
         g AS (
           SELECT doc_id, fp,
                  CAST(COUNT(1) OVER (PARTITION BY fp) AS BIGINT) AS group_size,
                  row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
           FROM b
         )
         SELECT doc_id, fp, group_size FROM g
         WHERE rn = ('0x' || substr(md5(fp || 'epoch0'), 1, 15))::BIGINT % group_size + 1""",

    // Greedy MMR unrolled to k=5 selection stages: sN = argmax of
    // 0.5·rel − 0.5·max(0, sim to s1..s_{N−1}), ties (score, rel desc,
    // cid asc) — exactly the operator's scan order. All sims/rels are
    // doubles from exact integer dots; ×0.5 is exact halving.
    "q124_mmr_rerank" ->
      s"""WITH $quantCte,
          q AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2 FROM en WHERE vec_id IN (0,1,2,3,4)),
          sc AS (
            SELECT q.qid, c.vec_id AS cid, c.v AS cv, c.n2 AS cn2,
                   ${cosSql("q.qv", "c.v", "q.qn2", "c.n2")} AS rel
            FROM en c, q WHERE c.vec_id <> q.qid
          ),
          cand AS (
            SELECT qid, cid, cv, cn2, rel FROM (
              SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, cid ASC) AS rn
              FROM sc)
            WHERE rn <= 10
          ),
          ps AS (
            SELECT a.qid, a.cid AS ca, b.cid AS cb,
                   greatest(0.0, ${cosSql("a.cv", "b.cv", "a.cn2", "b.cn2")}) AS sim
            FROM cand a JOIN cand b ON a.qid = b.qid AND a.cid <> b.cid
          ),
          s1 AS (
            SELECT qid, cid, rel, 0.5*rel - 0.5*0.0 AS score FROM (
              SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, cid ASC) AS rn
              FROM cand)
            WHERE rn = 1
          ),
          r2 AS (
            SELECT c.qid, c.cid, c.rel, 0.5*c.rel - 0.5*p1.sim AS score
            FROM cand c
            JOIN s1 ON s1.qid = c.qid AND c.cid <> s1.cid
            JOIN ps p1 ON p1.qid = c.qid AND p1.ca = c.cid AND p1.cb = s1.cid
          ),
          s2 AS (
            SELECT qid, cid, rel, score FROM (
              SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, rel DESC, cid ASC) AS rn
              FROM r2)
            WHERE rn = 1
          ),
          r3 AS (
            SELECT c.qid, c.cid, c.rel, 0.5*c.rel - 0.5*greatest(p1.sim, p2.sim) AS score
            FROM cand c
            JOIN s1 ON s1.qid = c.qid AND c.cid <> s1.cid
            JOIN s2 ON s2.qid = c.qid AND c.cid <> s2.cid
            JOIN ps p1 ON p1.qid = c.qid AND p1.ca = c.cid AND p1.cb = s1.cid
            JOIN ps p2 ON p2.qid = c.qid AND p2.ca = c.cid AND p2.cb = s2.cid
          ),
          s3 AS (
            SELECT qid, cid, rel, score FROM (
              SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, rel DESC, cid ASC) AS rn
              FROM r3)
            WHERE rn = 1
          ),
          r4 AS (
            SELECT c.qid, c.cid, c.rel,
                   0.5*c.rel - 0.5*greatest(p1.sim, p2.sim, p3.sim) AS score
            FROM cand c
            JOIN s1 ON s1.qid = c.qid AND c.cid <> s1.cid
            JOIN s2 ON s2.qid = c.qid AND c.cid <> s2.cid
            JOIN s3 ON s3.qid = c.qid AND c.cid <> s3.cid
            JOIN ps p1 ON p1.qid = c.qid AND p1.ca = c.cid AND p1.cb = s1.cid
            JOIN ps p2 ON p2.qid = c.qid AND p2.ca = c.cid AND p2.cb = s2.cid
            JOIN ps p3 ON p3.qid = c.qid AND p3.ca = c.cid AND p3.cb = s3.cid
          ),
          s4 AS (
            SELECT qid, cid, rel, score FROM (
              SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, rel DESC, cid ASC) AS rn
              FROM r4)
            WHERE rn = 1
          ),
          r5 AS (
            SELECT c.qid, c.cid, c.rel,
                   0.5*c.rel - 0.5*greatest(p1.sim, p2.sim, p3.sim, p4.sim) AS score
            FROM cand c
            JOIN s1 ON s1.qid = c.qid AND c.cid <> s1.cid
            JOIN s2 ON s2.qid = c.qid AND c.cid <> s2.cid
            JOIN s3 ON s3.qid = c.qid AND c.cid <> s3.cid
            JOIN s4 ON s4.qid = c.qid AND c.cid <> s4.cid
            JOIN ps p1 ON p1.qid = c.qid AND p1.ca = c.cid AND p1.cb = s1.cid
            JOIN ps p2 ON p2.qid = c.qid AND p2.ca = c.cid AND p2.cb = s2.cid
            JOIN ps p3 ON p3.qid = c.qid AND p3.ca = c.cid AND p3.cb = s3.cid
            JOIN ps p4 ON p4.qid = c.qid AND p4.ca = c.cid AND p4.cb = s4.cid
          ),
          s5 AS (
            SELECT qid, cid, rel, score FROM (
              SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, rel DESC, cid ASC) AS rn
              FROM r5)
            WHERE rn = 1
          )
          SELECT qid, cid, rel AS cosine, score AS mmr_score, CAST(1 AS INT) AS sel_rank FROM s1
          UNION ALL SELECT qid, cid, rel, score, CAST(2 AS INT) FROM s2
          UNION ALL SELECT qid, cid, rel, score, CAST(3 AS INT) FROM s3
          UNION ALL SELECT qid, cid, rel, score, CAST(4 AS INT) FROM s4
          UNION ALL SELECT qid, cid, rel, score, CAST(5 AS INT) FROM s5""",

    // Truth = brute top-5 (q36 chain at k=5); approx = the q45 IVF
    // chain; recall joined per query in exact integer ppm.
    "q125_ann_recall_audit" ->
      s"""WITH $quantCte,
          tq AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2 FROM en WHERE vec_id IN (0,1,2,3,4)),
          tscored AS (
            SELECT tq.qid, c.vec_id AS cid,
                   ${cosSql("tq.qv", "c.v", "tq.qn2", "c.n2")} AS cosine
            FROM en c, tq WHERE c.vec_id <> tq.qid),
          truth AS (
            SELECT qid, cid FROM (
              SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
              FROM tscored) WHERE rk <= 5),
          cents AS (SELECT vec_id AS cell, v AS cv, n2 AS cn2 FROM en WHERE vec_id < 16),
          cc AS (
            SELECT en.vec_id, en.v, en.n2, c.cell,
                   ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
            FROM en, cents c),
          assigned AS (
            SELECT vec_id, v, n2, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc) WHERE rn = 1),
          probes AS (
            SELECT vec_id AS qid, v AS qv, n2 AS qn2, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc WHERE vec_id IN (0,1,2,3,4)) WHERE rn <= 2),
          ascored AS (
            SELECT p.qid, a.vec_id AS cid,
                   ${cosSql("p.qv", "a.v", "p.qn2", "a.n2")} AS cosine
            FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.qid),
          approx AS (
            SELECT qid, cid FROM (
              SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
              FROM ascored) WHERE rk <= 5)
          SELECT t.qid, COUNT(1) AS n_truth, COUNT(a.cid) AS n_hit,
                 CAST((COUNT(a.cid) * 1000000) // COUNT(1) AS BIGINT) AS recall_ppm
          FROM truth t LEFT JOIN approx a ON a.qid = t.qid AND a.cid = t.cid
          GROUP BY 1""",

    // Same capped pair relation as q31, source-joined both sides.
    "q126_dup_source_matrix" ->
      s"""WITH $cappedShinglesCte,
          sizes AS (SELECT doc_id, COUNT(1) AS n FROM shj GROUP BY 1),
          inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(1) AS i
            FROM shj a JOIN shj b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
          pairs AS (
            SELECT da AS doc_a, db AS doc_b,
                   CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8)
          SELECT least(x.source, y.source) AS source_a,
                 greatest(x.source, y.source) AS source_b,
                 COUNT(1) AS n_pairs, MAX(jaccard) AS max_jaccard
          FROM pairs
          JOIN documents x ON x.doc_id = pairs.doc_a
          JOIN documents y ON y.doc_id = pairs.doc_b
          GROUP BY 1, 2""",

    // Truth = exact int64 L2 top-5 over the quantized vectors; approx
    // = the q102 ADC chain at k=5; recall joined per query.
    "q127_pq_recall_audit" ->
      s"""WITH $quantCte,
          $pqCte,
          tq AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2 FROM en WHERE vec_id IN (0,1,2,3,4)),
          tsc AS (
            SELECT tq.qid, c.vec_id AS cid,
                   tq.qn2 + c.n2 - 2 * ${dotSql.format("tq.qv", "c.v")} AS d2
            FROM en c, tq WHERE c.vec_id <> tq.qid),
          truth AS (
            SELECT qid, cid FROM (
              SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY d2 ASC, cid ASC) AS rk
              FROM tsc) WHERE rk <= 5),
          dt AS (
            SELECT vec_id AS qid, sub, cell AS code, d2 AS qd2
            FROM pd2 WHERE vec_id IN (0, 1, 2, 3, 4)),
          sc AS (
            SELECT dt.qid, p.vec_id AS cid, CAST(SUM(dt.qd2) AS BIGINT) AS adc_dist2
            FROM pcodes p JOIN dt ON dt.sub = p.sub AND dt.code = p.code
            WHERE p.vec_id <> dt.qid
            GROUP BY 1, 2),
          approx AS (
            SELECT qid, cid FROM (
              SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY adc_dist2 ASC, cid ASC) AS rk
              FROM sc) WHERE rk <= 5)
          SELECT t.qid, COUNT(1) AS n_truth, COUNT(a.cid) AS n_hit,
                 CAST((COUNT(a.cid) * 1000000) // COUNT(1) AS BIGINT) AS recall_ppm
          FROM truth t LEFT JOIN approx a ON a.qid = t.qid AND a.cid = t.cid
          GROUP BY 1""",

    // q125's IVF machinery swept over nProbe ∈ {1,2,4,8} at k=10:
    // probes keep their rank (prank), each curve point filters
    // prank <= n_probe, and recall pools across the query set per
    // point (880000 → 960000 ppm at sf0.01 — a real monotone curve).
    "q128_ivf_recall_curve" ->
      s"""WITH $quantCte,
          tq AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2 FROM en WHERE vec_id IN (0,1,2,3,4)),
          tscored AS (
            SELECT tq.qid, c.vec_id AS cid,
                   ${cosSql("tq.qv", "c.v", "tq.qn2", "c.n2")} AS cosine
            FROM en c, tq WHERE c.vec_id <> tq.qid),
          truth AS (
            SELECT qid, cid FROM (
              SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
              FROM tscored) WHERE rk <= 10),
          cents AS (SELECT vec_id AS cell, v AS cv, n2 AS cn2 FROM en WHERE vec_id < 16),
          cc AS (
            SELECT en.vec_id, en.v, en.n2, c.cell,
                   ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
            FROM en, cents c),
          assigned AS (
            SELECT vec_id, v, n2, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc) WHERE rn = 1),
          probes AS (
            SELECT vec_id AS qid, v AS qv, n2 AS qn2, cell, rn AS prank FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc WHERE vec_id IN (0,1,2,3,4)) WHERE rn <= 8),
          np AS (SELECT * FROM (VALUES (1),(2),(4),(8)) AS t(n_probe)),
          ascored AS (
            SELECT np.n_probe, p.qid, a.vec_id AS cid,
                   ${cosSql("p.qv", "a.v", "p.qn2", "a.n2")} AS cosine
            FROM assigned a
            JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.qid
            CROSS JOIN np WHERE p.prank <= np.n_probe),
          approx AS (
            SELECT n_probe, qid, cid FROM (
              SELECT n_probe, qid, cid,
                     row_number() OVER (PARTITION BY n_probe, qid ORDER BY cosine DESC, cid ASC) AS rk
              FROM ascored) WHERE rk <= 10)
          SELECT np.n_probe,
                 COUNT(DISTINCT t.qid) AS n_queries,
                 COUNT(1) AS n_truth,
                 COUNT(a.cid) AS n_hit,
                 CAST((COUNT(a.cid) * 1000000) // COUNT(1) AS BIGINT) AS recall_ppm
          FROM truth t CROSS JOIN np
          LEFT JOIN approx a ON a.n_probe = np.n_probe AND a.qid = t.qid AND a.cid = t.cid
          GROUP BY 1""",

    // q96's SemDeDup chain with the PRODUCTION hot-cell cap mirrored:
    // the comparison (b) side keeps only each cell's 64 lowest ids.
    "q129_semdedup_capped" ->
      s"""WITH $quantCte,
          $kmeansCte,
          cc2 AS (
            SELECT en.vec_id, c.cell,
                   ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
            FROM en, cn c
          ),
          asg AS (
            SELECT vec_id, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc2) WHERE rn = 1
          ),
          m AS (SELECT en.vec_id, en.v, en.n2, asg.cell FROM en JOIN asg USING (vec_id)),
          mb AS (
            SELECT vec_id, v, n2, cell FROM (
              SELECT m.*, row_number() OVER (PARTITION BY cell ORDER BY vec_id ASC) AS crn
              FROM m) WHERE crn <= 4
          ),
          sc AS (
            SELECT a.vec_id AS vec_id, b.vec_id AS bid,
                   ${cosSql("a.v", "b.v", "a.n2", "b.n2")} AS cos
            FROM m a JOIN mb b ON a.cell = b.cell AND a.vec_id > b.vec_id
          ),
          p AS (
            SELECT vec_id, MIN(bid) AS survivor_id, MAX(cos) AS max_cos
            FROM sc WHERE cos >= 0.4 GROUP BY 1
          )
          SELECT m.vec_id, m.cell AS cluster_id,
                 CASE WHEN p.vec_id IS NULL THEN 'keep' ELSE 'drop_semantic' END AS verdict,
                 p.survivor_id, p.max_cos
          FROM m LEFT JOIN p ON p.vec_id = m.vec_id""",

    // q88's multi-probe machinery swept over the probe budget: probe
    // j = 0 is the own bucket, j >= 1 flips bit j-1; each curve point
    // keeps probes j <= n_flips, ranked per (n_flips, qid) at k=10,
    // recall pooled across the query set per point.
    "q130_lsh_recall_curve" ->
      s"""WITH $quantCte,
          tq AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2 FROM en WHERE vec_id IN (0,1,2,3,4)),
          tscored AS (
            SELECT tq.qid, c.vec_id AS cid,
                   ${cosSql("tq.qv", "c.v", "tq.qn2", "c.n2")} AS cosine
            FROM en c, tq WHERE c.vec_id <> tq.qid),
          truth AS (
            SELECT qid, cid FROM (
              SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
              FROM tscored) WHERE rk <= 10),
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
            SELECT qid, qv, qn2, j,
                   xor(bucket, CASE WHEN j = 0 THEN 0 ELSE (1::BIGINT << (j-1)) END) AS bucket
            FROM q, (SELECT unnest(generate_series(0, 8)) AS j)
          ),
          nf AS (SELECT * FROM (VALUES (0),(2),(4),(8)) AS t(n_flips)),
          ascored AS (
            SELECT nf.n_flips, pq.qid, c.vec_id AS cid,
                   ${cosSql("pq.qv", "c.v", "pq.qn2", "c.n2")} AS cosine
            FROM eb c
            JOIN pq ON c.bucket = pq.bucket AND c.vec_id <> pq.qid
            CROSS JOIN nf WHERE pq.j <= nf.n_flips),
          approx AS (
            SELECT n_flips, qid, cid FROM (
              SELECT n_flips, qid, cid,
                     row_number() OVER (PARTITION BY n_flips, qid ORDER BY cosine DESC, cid ASC) AS rk
              FROM ascored) WHERE rk <= 10)
          SELECT nf.n_flips,
                 COUNT(DISTINCT t.qid) AS n_queries,
                 COUNT(1) AS n_truth,
                 COUNT(a.cid) AS n_hit,
                 CAST((COUNT(a.cid) * 1000000) // COUNT(1) AS BIGINT) AS recall_ppm
          FROM truth t CROSS JOIN nf
          LEFT JOIN approx a ON a.n_flips = nf.n_flips AND a.qid = t.qid AND a.cid = t.cid
          GROUP BY 1""",

    // q96's assignment chain split odd (new) vs even (index); dup_of =
    // lowest index id within tau, no keep-chain (index authoritative).
    "q131_semdedup_incremental" ->
      s"""WITH $quantCte,
          $kmeansCte,
          cc2 AS (
            SELECT en.vec_id, c.cell,
                   ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
            FROM en, cn c
          ),
          asg AS (
            SELECT vec_id, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc2) WHERE rn = 1
          ),
          m AS (SELECT en.vec_id, en.v, en.n2, asg.cell FROM en JOIN asg USING (vec_id)),
          mN AS (SELECT * FROM m WHERE vec_id % 2 = 1),
          mI AS (SELECT * FROM m WHERE vec_id % 2 = 0),
          sc AS (
            SELECT a.vec_id AS vec_id, b.vec_id AS bid,
                   ${cosSql("a.v", "b.v", "a.n2", "b.n2")} AS cos
            FROM mN a JOIN mI b ON a.cell = b.cell AND a.vec_id <> b.vec_id
          ),
          p AS (
            SELECT vec_id, MIN(bid) AS dup_of, MAX(cos) AS max_cos
            FROM sc WHERE cos >= 0.4 GROUP BY 1
          )
          SELECT mN.vec_id, mN.cell AS cluster_id,
                 CASE WHEN p.vec_id IS NULL THEN 'keep' ELSE 'drop_semantic' END AS verdict,
                 p.dup_of, p.max_cos
          FROM mN LEFT JOIN p ON p.vec_id = mN.vec_id""",

    // q38's score expression swept over candidate gate thresholds:
    // one scoring CTE, |bars|-way cross join, conditional rollup.
    "q132_quality_yield_curve" ->
      s"""WITH $wordsCte,
          m AS (
            SELECT doc_id,
                   CAST(len(ws) AS BIGINT) AS n_tokens,
                   least(1.0, len(ws) / 100.0) * 0.5
                     + least(1.0, (CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','in','to','is','that','it','for'))) AS DOUBLE) / len(ws)) * 4) * 0.3
                     + CASE WHEN CAST(list_aggregate(list_transform(ws, w -> length(w)), 'sum') AS DOUBLE) / len(ws) BETWEEN 3.0 AND 8.0 THEN 0.2 ELSE 0.0 END AS quality_score
            FROM words
          ),
          bars AS (SELECT CAST(min_score AS DOUBLE) AS min_score
                   FROM (VALUES (0.3),(0.5),(0.7),(0.9)) AS t(min_score))
          SELECT bars.min_score,
                 COUNT(CASE WHEN quality_score >= min_score THEN 1 END) AS n_docs_kept,
                 COALESCE(CAST(SUM(CASE WHEN quality_score >= min_score THEN n_tokens END) AS BIGINT), 0) AS n_tokens_kept,
                 COUNT(1) AS n_docs_total
          FROM m CROSS JOIN bars
          GROUP BY 1""",

    // q31's capped pair machinery scored at the loosest bar (0.7),
    // swept over the tighter thresholds.
    "q133_dedup_threshold_sweep" ->
      s"""WITH $cappedShinglesCte,
          sizes AS (SELECT doc_id, COUNT(1) AS n FROM shj GROUP BY 1),
          inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(1) AS i
            FROM shj a JOIN shj b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
          pairs AS (
            SELECT da AS doc_a, db AS doc_b,
                   CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8),
          th AS (SELECT CAST(t AS DOUBLE) AS threshold
                 FROM (VALUES (0.8),(0.95),(0.99)) AS v(t)),
          np AS (
            SELECT threshold,
                   COUNT(CASE WHEN jaccard >= threshold THEN 1 END) AS n_pairs
            FROM pairs CROSS JOIN th GROUP BY 1),
          nd AS (
            SELECT threshold,
                   COUNT(DISTINCT CASE WHEN jaccard >= threshold THEN doc_id END) AS n_docs_affected
            FROM (SELECT doc_a AS doc_id, jaccard FROM pairs
                  UNION ALL SELECT doc_b, jaccard FROM pairs) CROSS JOIN th
            GROUP BY 1)
          SELECT np.threshold, np.n_pairs, nd.n_docs_affected
          FROM np JOIN nd USING (threshold)""",

    // Split hash keys on the dedup SURVIVOR (q64's relation), not the
    // doc's own id — whole clusters move between splits as a unit.
    "q134_leakfree_split" ->
      s"""WITH RECURSIVE $verdictCtes,
          sv AS (SELECT doc_id, COALESCE(cluster_min, exact_keeper) AS survivor_doc_id FROM j),
          h AS (
            SELECT doc_id, survivor_doc_id,
                   ('0x' || substr(md5('split_' || CAST(survivor_doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS hv
            FROM sv)
          SELECT doc_id, survivor_doc_id,
                 CASE WHEN hv < 80 THEN 'train' WHEN hv < 90 THEN 'val' ELSE 'test' END AS split
          FROM h""",

    // SQ8 codes + exact decode error on the quantized grid (sqCte
    // mirrors Similarity.sqScales/sqEncode bit for bit).
    "q135_sq8_codes" ->
      s"""WITH $quantCte,
          $sqCte
          SELECT vec_id, CAST(i AS INT) AS i, code,
                 abs(127 * x - code * s) // 127 AS abs_err
          FROM enc""",

    // Recall@10 of SQ8-compressed cosine ranking vs exact truth.
    "q136_sq8_recall" ->
      s"""WITH $quantCte,
          $sqCte,
          wts AS (SELECT vec_id, i, code * (s // 1000) AS w FROM enc),
          wn AS (SELECT vec_id, CAST(SUM(w * w) AS BIGINT) AS wn2 FROM wts GROUP BY 1),
          dots AS (
            SELECT q.vec_id AS qid, c.vec_id AS cid, CAST(SUM(q.w * c.w) AS BIGINT) AS d
            FROM wts q JOIN wts c ON q.i = c.i AND c.vec_id <> q.vec_id
            WHERE q.vec_id < 5
            GROUP BY 1, 2),
          sqcos AS (
            SELECT qid, cid,
                   CASE WHEN qn.wn2 > 0 AND cn.wn2 > 0
                        THEN CAST(d AS DOUBLE) / (sqrt(CAST(qn.wn2 AS DOUBLE)) * sqrt(CAST(cn.wn2 AS DOUBLE)))
                   END AS cosine
            FROM dots JOIN wn qn ON qn.vec_id = qid JOIN wn cn ON cn.vec_id = cid),
          appr AS (
            SELECT qid, cid FROM (
              SELECT qid, cid,
                     row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
              FROM sqcos) WHERE rk <= 10),
          tsc AS (
            SELECT q.vec_id AS qid, c.vec_id AS cid,
                   ${cosSql("q.v", "c.v", "q.n2", "c.n2")} AS cosine
            FROM en c, en q WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
          tr AS (
            SELECT qid, cid FROM (
              SELECT qid, cid,
                     row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
              FROM tsc) WHERE rk <= 10)
          SELECT tr.qid, COUNT(1) AS n_truth,
                 COUNT(appr.cid) AS n_hit,
                 (COUNT(appr.cid) * 1000000) // COUNT(1) AS recall_ppm
          FROM tr LEFT JOIN appr ON appr.qid = tr.qid AND appr.cid = tr.cid
          GROUP BY 1""",

    // C4/Gopher rule bundle (minWords=30, minStopHits=1); keep
    // excludes the line-level terminal-punct rule, as documented.
    "q137_heuristic_gate" ->
      s"""WITH $wordsCte,
          m AS (
            SELECT doc_id, text,
                   CAST(len(ws) AS BIGINT) AS nt,
                   CAST(list_aggregate(list_transform(ws, w -> len(w)), 'sum') AS BIGINT) AS sumlen,
                   CAST(len(list_filter(ws, w -> list_contains(['the','a','of','and','in','to','is','that','it','for'], w))) AS BIGINT) AS stops,
                   CAST((len(text) - len(replace(text, '#', ''))) +
                        (len(text) - len(replace(text, '…', ''))) AS BIGINT) AS symbols
            FROM words)
          SELECT doc_id,
                 nt AS n_words,
                 nt < 30 AS too_short,
                 (sumlen < nt * 3 OR sumlen > nt * 10) AS bad_word_len,
                 symbols * 10 > nt AS too_symbolic,
                 contains(lower(text), 'lorem ipsum') AS has_lorem,
                 contains(text, '{') AS has_brace,
                 NOT regexp_matches(rtrim(text), '[.!?]$$') AS no_terminal_punct,
                 stops < 1 AS too_few_stopwords,
                 (nt >= 30 AND NOT (sumlen < nt * 3 OR sumlen > nt * 10)
                   AND NOT symbols * 10 > nt
                   AND NOT contains(lower(text), 'lorem ipsum')
                   AND NOT contains(text, '{')
                   AND stops >= 1) AS keep
          FROM m""",

    // Char-class census in exact integer ppm + script verdict.
    "q138_script_profile" ->
      """WITH c AS (
           SELECT doc_id,
                  CAST(len(text) AS BIGINT) AS n_chars,
                  CAST(len(text) - len(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
                  CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
                  CAST(len(text) - len(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS n_space,
                  CAST(len(text) - len(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct
           FROM documents),
         p AS (
           SELECT doc_id, n_chars, n_alpha, n_digit, n_space, n_punct,
                  n_chars - n_alpha - n_digit - n_space - n_punct AS n_other,
                  CASE WHEN n_chars > 0 THEN (n_alpha * 1000000) // n_chars ELSE 0 END AS alpha_ppm,
                  CASE WHEN n_chars > 0 THEN (n_digit * 1000000) // n_chars ELSE 0 END AS digit_ppm
           FROM c)
         SELECT doc_id, n_chars, n_alpha, n_digit, n_space, n_punct, n_other,
                alpha_ppm, digit_ppm,
                CASE WHEN alpha_ppm >= 500000 THEN 'latin'
                     WHEN digit_ppm >= 300000 THEN 'numeric'
                     ELSE 'other' END AS script_class
         FROM p""",

    // Simplified-silhouette cell report over the shared trained
    // codebook: nearest + runner-up by exact int64 L2², tie to the
    // lowest cell — same ordering as the Spark struct sort.
    "q139_codebook_quality" ->
      s"""WITH $quantCte,
          $kmeansCte,
          dd AS (
            SELECT en.vec_id, c.cell,
                   en.n2 + c.cn2 - 2 * ${dotSql.format("en.v", "c.cv")} AS d2
            FROM en CROSS JOIN cn c),
          rk AS (
            SELECT vec_id, cell, d2,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS r
            FROM dd),
          top2 AS (
            SELECT a.vec_id, a.cell, a.d2 AS a_d2, b.d2 AS b_d2
            FROM rk a JOIN rk b ON a.vec_id = b.vec_id AND a.r = 1 AND b.r = 2),
          sep AS (
            SELECT cell, a_d2,
                   CASE WHEN b_d2 // 1000 > 0 THEN (a_d2 * 1000) // (b_d2 // 1000)
                        ELSE 1000000 END AS sep_ppm
            FROM top2)
          SELECT cell, COUNT(1) AS n_vectors,
                 CAST(SUM(a_d2) AS BIGINT) // COUNT(1) AS mean_own_d2,
                 CAST(SUM(sep_ppm) AS BIGINT) // COUNT(1) AS mean_separation_ppm
          FROM sep GROUP BY 1""",

    // UniMax water-filling in exact int64 (budget 200k chars, epoch
    // cap 2.0): capped iff cap_i·R_i ≤ budget − Σ_{smaller} cap_j.
    "q140_unimax_plan" ->
      """WITH counts AS (
           SELECT lang AS language, CAST(SUM(n_chars) AS BIGINT) AS n_tokens
           FROM documents GROUP BY 1),
         wi AS (
           SELECT language, n_tokens,
                  (n_tokens * 2000) // 1000 AS cap_alloc,
                  row_number() OVER (ORDER BY n_tokens ASC, language ASC) AS idx,
                  COUNT(1) OVER () AS l,
                  COALESCE(SUM((n_tokens * 2000) // 1000) OVER (
                    ORDER BY n_tokens ASC, language ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pfx
           FROM counts),
         fl AS (
           SELECT *, cap_alloc * (l - idx + 1) <= 200000 - pfx AS capped FROM wi),
         tot AS (
           SELECT CAST(200000 - COALESCE(SUM(CASE WHEN capped THEN cap_alloc END), 0) AS BIGINT) AS lft,
                  COUNT(CASE WHEN NOT capped THEN 1 END) AS u
           FROM fl)
         SELECT language, n_tokens, capped,
                CAST(CASE WHEN capped THEN cap_alloc
                          WHEN u > 0 THEN lft // u
                          ELSE 0 END AS BIGINT) AS alloc_tokens,
                CAST((CASE WHEN capped THEN cap_alloc
                           WHEN u > 0 THEN lft // u
                           ELSE 0 END * 1000) // GREATEST(n_tokens, 1) AS BIGINT) AS epochs_x1000
         FROM fl CROSS JOIN tot""",

    // IVF-PQ encode: the pq chain run on residuals to the trained
    // coarse codebook; coarse cell carried alongside the codes.
    "q141_ivfpq_codes" ->
      s"""WITH $quantCte,
          $kmeansCte,
          $residCte,
          ${pqCteOn("renn")}
          SELECT p.vec_id, r.coarse_cell AS cell, CAST(p.sub AS INT) AS sub, p.code, p.d2
          FROM pcodes p JOIN renn r ON r.vec_id = p.vec_id""",

    // IVFADC serving: probe 2 coarse cells per query, distance tables
    // from the query's residual IN EACH PROBED CELL to every residual
    // codeword, ADC sum over probed cells' code lists.
    "q142_ivfpq_topk" ->
      s"""WITH $quantCte,
          $kmeansCte,
          $residCte,
          ${pqCteOn("renn")},
          qpr AS (
            SELECT vec_id AS qid, cell, ccv, qv FROM (
              SELECT en.vec_id, c.cell, c.cv AS ccv, en.v AS qv,
                     row_number() OVER (PARTITION BY en.vec_id
                       ORDER BY ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} DESC, c.cell ASC) AS pr
              FROM en CROSS JOIN cn c WHERE en.vec_id < 5) WHERE pr <= 2),
          qres AS (
            SELECT qid, cell, list_transform(list_zip(qv, ccv), p -> p[1] - p[2]) AS rv
            FROM qpr),
          qsl AS (
            SELECT qid, cell, sub,
                   list_slice(rv, sub*${EmbDim / PqM} + 1, sub*${EmbDim / PqM} + ${EmbDim / PqM}) AS sv
            FROM qres, subs),
          qsn AS (
            SELECT qid, cell, sub, sv,
                   CAST(list_aggregate(list_transform(sv, x -> x*x), 'sum') AS BIGINT) AS sn2
            FROM qsl),
          dt AS (
            SELECT qid, qsn.cell, qsn.sub, c.cell AS code,
                   qsn.sn2 + c.cn2 - 2*${dotSql.format("qsn.sv", "c.cv")} AS qd2
            FROM qsn JOIN pcbn c ON c.sub = qsn.sub),
          adc AS (
            SELECT dt.qid, p.vec_id AS cid, CAST(SUM(dt.qd2) AS BIGINT) AS adc_dist2
            FROM pcodes p
            JOIN renn r ON r.vec_id = p.vec_id
            JOIN dt ON dt.cell = r.coarse_cell AND dt.sub = p.sub AND dt.code = p.code
            WHERE p.vec_id <> dt.qid
            GROUP BY 1, 2)
          SELECT qid, cid, adc_dist2, rk FROM (
            SELECT *, row_number() OVER (PARTITION BY qid ORDER BY adc_dist2 ASC, cid ASC) AS rk
            FROM adc) WHERE rk <= 5""",

    // Curriculum schedule: quality-score ntile (3 phases, cleanest
    // first) + the q108 deterministic shard/pos order.
    "q143_curriculum_schedule" ->
      s"""WITH $wordsCte,
          m AS (
            SELECT doc_id,
                   CAST(len(ws) AS BIGINT) AS nt,
                   CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','in','to','is','that','it','for'))) AS DOUBLE) / len(ws) AS stopr,
                   CAST(list_aggregate(list_transform(ws, w -> length(w)), 'sum') AS DOUBLE) / len(ws) AS awl
            FROM words),
          sc AS (
            SELECT doc_id,
                   least(1.0, nt / 100.0) * 0.5 + least(1.0, stopr * 4) * 0.3
                     + CASE WHEN awl BETWEEN 3.0 AND 8.0 THEN 0.2 ELSE 0.0 END AS score
            FROM m),
          ph AS (
            SELECT doc_id,
                   CAST(ntile(3) OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS phase
            FROM sc),
          k AS (
            SELECT doc_id, ('0x' || substr(md5('curr_' || doc_id), 1, 15))::BIGINT AS sk
            FROM documents)
          SELECT ph.doc_id, phase, sk % 8 AS shard,
                 CAST(row_number() OVER (PARTITION BY sk % 8 ORDER BY sk, ph.doc_id) AS BIGINT) AS pos
          FROM ph JOIN k ON k.doc_id = ph.doc_id""",

    // Triplet mining: q43's banded near-dup positives joined with
    // hard negatives mined THROUGH the trained IVF index — anchors
    // probe their 2 nearest k-means cells (q63's probe discipline) and
    // rank only different-label vectors assigned to those cells.
    "q144_triplet_mining" ->
      s"""WITH $quantCte,
          $kmeansCte,
          $neardupCte,
          pos AS (
            SELECT vec_a AS anchor, vec_b AS positive, cosine AS pos_cos
            FROM ndscored WHERE cosine >= 0.35),
          el AS (SELECT en.vec_id, v, n2, label FROM en JOIN embeddings USING (vec_id)),
          cc2 AS (
            SELECT en.vec_id, c.cell,
                   ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
            FROM en, cn c),
          cellrk AS (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
            FROM cc2),
          assigned AS (
            SELECT el.vec_id, el.v, el.n2, el.label, a.cell
            FROM el JOIN (SELECT vec_id, cell FROM cellrk WHERE rn = 1) a USING (vec_id)),
          anch AS (SELECT DISTINCT anchor FROM pos),
          probes AS (
            SELECT q.vec_id AS qid, q.v AS qv, q.n2 AS qn2, q.label AS ql, p.cell
            FROM el q
            JOIN anch ON anch.anchor = q.vec_id
            JOIN (SELECT vec_id, cell FROM cellrk WHERE rn <= 2) p ON p.vec_id = q.vec_id),
          nsc AS (
            SELECT p.qid, a.vec_id AS cid, a.label AS neg_label,
                   ${cosSql("p.qv", "a.v", "p.qn2", "a.n2")} AS cosine
            FROM assigned a JOIN probes p ON a.cell = p.cell
            WHERE a.vec_id <> p.qid AND a.label IS DISTINCT FROM p.ql),
          nr AS (
            SELECT qid, cid, neg_label, cosine,
                   row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
            FROM nsc)
          SELECT pos.anchor, pos.positive, pos.pos_cos,
                 nr.cid AS negative, nr.neg_label, nr.cosine AS neg_cos, CAST(nr.rk AS INT) AS rk
          FROM pos JOIN nr ON nr.qid = pos.anchor WHERE nr.rk <= 3""",

    // Per-dim point: prefix-sliced vectors re-normed, cosine top-10,
    // pooled hit counts vs the full-dim truth list.
    "q145_matryoshka_curve" -> {
      val dims = Seq(8, 16, 32, 64)
      val sliceCtes = dims.map { d =>
        s"""s$d AS (SELECT vec_id, list_slice(v, 1, $d) AS v FROM e),
            sn$d AS (SELECT vec_id, v,
                            CAST(list_aggregate(list_transform(v, x -> x*x), 'sum') AS BIGINT) AS n2
                     FROM s$d),
            aq$d AS (
              SELECT q.vec_id AS qid, c.vec_id AS cid,
                     ${cosSql("q.v", "c.v", "q.n2", "c.n2")} AS cosine
              FROM sn$d c, sn$d q WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
            ap$d AS (
              SELECT qid, cid FROM (
                SELECT qid, cid,
                       row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
                FROM aq$d) WHERE rk <= 10)"""
      }.mkString(",\n")
      val points = dims.map { d =>
        s"""SELECT $d AS dim, COUNT(DISTINCT tr.qid) AS n_queries,
                   COUNT(1) AS n_truth, COUNT(ap$d.cid) AS n_hit,
                   (COUNT(ap$d.cid) * 1000000) // COUNT(1) AS recall_ppm
            FROM tr LEFT JOIN ap$d ON ap$d.qid = tr.qid AND ap$d.cid = tr.cid"""
      }.mkString(" UNION ALL ")
      s"""WITH $quantCte,
          tq AS (
            SELECT q.vec_id AS qid, c.vec_id AS cid,
                   ${cosSql("q.v", "c.v", "q.n2", "c.n2")} AS cosine
            FROM en c, en q WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
          tr AS (
            SELECT qid, cid FROM (
              SELECT qid, cid,
                     row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
              FROM tq) WHERE rk <= 10),
          $sliceCtes
          $points"""
    },

    // Vector twin of q126's cross-source matrix: banded near-dup pairs
    // rolled up by unordered label pair.
    "q146_crosslabel_neardups" ->
      s"""WITH $quantCte,
          $neardupCte,
          pr AS (SELECT vec_a, vec_b, cosine FROM ndscored WHERE cosine >= 0.35),
          lab AS (SELECT vec_id, label FROM embeddings),
          j AS (
            SELECT least(a.label, b.label) AS label_a,
                   greatest(a.label, b.label) AS label_b, cosine
            FROM pr JOIN lab a ON a.vec_id = pr.vec_a JOIN lab b ON b.vec_id = pr.vec_b)
          SELECT label_a, label_b, COUNT(1) AS n_pairs, MAX(cosine) AS max_cosine
          FROM j GROUP BY 1, 2""",

    // Distinct word 6-gram hashes per doc (q89's gram key), gram
    // document frequency, per-doc shared/novel split in exact ppm.
    "q147_novelty_scores" ->
      s"""WITH $wordsCte,
          g0 AS (
            SELECT doc_id,
                   CASE WHEN len(ws) >= 6
                        THEN list_distinct(list_transform(generate_series(1, len(ws)-5),
                               i -> ('0x' || substr(md5(ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||
                                                        ws[i+3]||' '||ws[i+4]||' '||ws[i+5]), 1, 15))::BIGINT))
                        ELSE []::BIGINT[] END AS gs
            FROM words),
          g AS (SELECT doc_id, unnest(gs) AS g FROM g0),
          dfc AS (SELECT g, COUNT(1) AS dfn FROM g GROUP BY 1),
          per AS (
            SELECT doc_id, COUNT(1) AS n_grams,
                   COUNT(CASE WHEN dfn >= 2 THEN 1 END) AS shared_grams
            FROM g JOIN dfc USING (g) GROUP BY 1)
          SELECT doc_id, n_grams, shared_grams,
                 (shared_grams * 1000000) // n_grams AS shared_ppm,
                 1000000 - (shared_grams * 1000000) // n_grams AS novelty_ppm
          FROM per""",

    // Pad-to-512 vs contiguous packing per source, integer waste math.
    "q150_packing_efficiency" ->
      """WITH t AS (
           SELECT source,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
           FROM documents),
         agg AS (
           SELECT source, COUNT(1) AS n_docs,
                  CAST(SUM(n) AS BIGINT) AS total_tokens,
                  CAST(SUM((n + 511) // 512) AS BIGINT) AS padded_bins
           FROM t GROUP BY 1),
         b AS (
           SELECT *, (total_tokens + 511) // 512 AS packed_bins FROM agg)
         SELECT source, n_docs, total_tokens, padded_bins, packed_bins,
                padded_bins * 512 - total_tokens AS padded_waste,
                packed_bins * 512 - total_tokens AS packed_waste,
                ((padded_bins - packed_bins) * 1000000) // greatest(padded_bins, 1) AS savings_ppm
         FROM b""",

    // Both split assignments re-derived over the SAME capped pair
    // relation the verdict chain uses; the survivor-keyed row must
    // count zero cross-split pairs.
    "q151_split_leakage" ->
      s"""WITH RECURSIVE $verdictCtes,
          sv AS (SELECT doc_id, COALESCE(cluster_min, exact_keeper) AS s_id FROM j),
          pda AS (
            SELECT doc_id,
                   CASE WHEN hv < 80 THEN 'train' WHEN hv < 90 THEN 'val' ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         ('0x' || substr(md5('split_' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS hv
                  FROM documents)),
          sva AS (
            SELECT doc_id,
                   CASE WHEN hv < 80 THEN 'train' WHEN hv < 90 THEN 'val' ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         ('0x' || substr(md5('split_' || CAST(s_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS hv
                  FROM sv)),
          m1 AS (
            SELECT 'per_doc' AS mode, COUNT(1) AS n_pairs,
                   COUNT(CASE WHEN a.split <> b.split THEN 1 END) AS n_cross_split
            FROM pairs JOIN pda a ON a.doc_id = doc_a JOIN pda b ON b.doc_id = doc_b),
          m2 AS (
            SELECT 'survivor_keyed' AS mode, COUNT(1) AS n_pairs,
                   COUNT(CASE WHEN a.split <> b.split THEN 1 END) AS n_cross_split
            FROM pairs JOIN sva a ON a.doc_id = doc_a JOIN sva b ON b.doc_id = doc_b)
          SELECT * FROM m1 UNION ALL SELECT * FROM m2""",

    // Jelinek-Mercer interpolated trigram LM: all components are
    // marginals of ONE counted trigram relation, mixed in exact ppm.
    "q152_trigram_lm" ->
      s"""WITH $wordsCte,
          t AS (SELECT doc_id, generate_subscripts(ws, 1) AS i, unnest(ws) AS w FROM words),
          tg0 AS (
            SELECT doc_id, w AS w1,
                   lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2,
                   lead(w, 2) OVER (PARTITION BY doc_id ORDER BY i) AS w3
            FROM t),
          tg AS (SELECT doc_id, w1, w2, w3 FROM tg0 WHERE w3 IS NOT NULL),
          c3 AS (SELECT w1, w2, w3, COUNT(1) AS c3 FROM tg GROUP BY 1, 2, 3),
          c12 AS (SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS c12 FROM c3 GROUP BY 1, 2),
          c23 AS (SELECT w2, w3, CAST(SUM(c3) AS BIGINT) AS c23 FROM c3 GROUP BY 1, 2),
          c2 AS (SELECT w2, CAST(SUM(c23) AS BIGINT) AS c2 FROM c23 GROUP BY 1),
          cw3 AS (SELECT w3, CAST(SUM(c3) AS BIGINT) AS cw3 FROM c3 GROUP BY 1),
          nt AS (SELECT CAST(SUM(cw3) AS BIGINT) AS ntot FROM cw3),
          pr AS (
            SELECT c3.w1, c3.w2, c3.w3,
                   (500 * ((c3.c3 * 1000000) // c12.c12)
                    + 300 * ((c23.c23 * 1000000) // c2.c2)
                    + 200 * ((cw3.cw3 * 1000000) // nt.ntot)) // 1000 AS ip_ppm
            FROM c3 JOIN c12 USING (w1, w2) JOIN c23 USING (w2, w3)
            JOIN c2 USING (w2) JOIN cw3 USING (w3) CROSS JOIN nt)
          SELECT tg.doc_id, COUNT(1) AS n_trigrams,
                 CAST(SUM(p.ip_ppm) AS DOUBLE) / COUNT(1) AS avg_interp_ppm,
                 CAST(MIN(p.ip_ppm) AS BIGINT) AS min_interp_ppm
          FROM tg JOIN pr p USING (w1, w2, w3)
          GROUP BY 1""",

    // Cell populations from the residCte assignment (cosine argmax vs
    // the trained codebook), exact integer percentiles over the
    // |cells|-row relation.
    "q154_cell_skew" ->
      s"""WITH $quantCte,
          $kmeansCte,
          $residCte,
          pops AS (SELECT cell, COUNT(1) AS n FROM ras GROUP BY 1),
          rk AS (
            SELECT cell, n,
                   row_number() OVER (ORDER BY n ASC, cell ASC) AS r,
                   COUNT(1) OVER () AS nc
            FROM pops)
          SELECT MAX(nc) AS n_cells,
                 CAST(SUM(n) AS BIGINT) AS n_vectors,
                 MIN(n) AS min_pop,
                 MIN(CASE WHEN r * 2 >= nc * 1 THEN n END) AS p50_pop,
                 MIN(CASE WHEN r * 100 >= nc * 99 THEN n END) AS p99_pop,
                 MAX(n) AS max_pop,
                 (MAX(n) * MAX(nc) * 1000) // GREATEST(CAST(SUM(n) AS BIGINT), 1) AS imbalance_x1000
          FROM rk""",

    // The q85 chain re-derived per stage: docs/chars surviving raw →
    // dedup → bench-drop → decontaminate → rebalance.
    "q153_curation_funnel" ->
      s"""WITH RECURSIVE $verdictCtes,
          keep AS (
            SELECT doc_id FROM j WHERE doc_id = COALESCE(cluster_min, exact_keeper)
          ),
          k1 AS (
            SELECT d.doc_id, d.text, d.source, d.n_chars
            FROM documents d JOIN keep USING (doc_id)
          ),
          nb AS (SELECT * FROM k1 WHERE source <> 'src0'),
          grn AS (
            SELECT doc_id, source, n_chars, string_split_regex(trim(text), '\\s+') AS ws FROM nb
          ),
          gr5 AS (
            SELECT doc_id,
                   CASE WHEN len(ws) >= 5
                        THEN list_distinct(list_transform(generate_series(1, len(ws)-4),
                               i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]))
                        ELSE []::VARCHAR[] END AS gs
            FROM grn
          ),
          exg AS (SELECT doc_id, unnest(gs) AS s FROM gr5),
          bw AS (
            SELECT string_split_regex(trim(text), '\\s+') AS ws FROM documents WHERE source = 'src0'
          ),
          bgr AS (
            SELECT DISTINCT unnest(
              CASE WHEN len(ws) >= 5
                   THEN list_distinct(list_transform(generate_series(1, len(ws)-4),
                          i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]))
                   ELSE []::VARCHAR[] END) AS s
            FROM bw
          ),
          contam AS (SELECT DISTINCT e.doc_id FROM exg e JOIN bgr ON e.s = bgr.s),
          k2 AS (
            SELECT nb.* FROM nb WHERE NOT EXISTS (SELECT 1 FROM contam c WHERE c.doc_id = nb.doc_id)
          ),
          cnts AS (SELECT source, COUNT(1) AS n FROM k2 GROUP BY source),
          mn AS (SELECT MIN(n) AS nmin FROM cnts),
          rates AS (
            SELECT source,
                   GREATEST(1, CAST(round(sqrt(CAST(nmin AS DOUBLE) / n) * 10000) AS BIGINT)) AS bps
            FROM cnts, mn
          ),
          k3 AS (
            SELECT k2.source, k2.n_chars FROM k2 JOIN rates USING (source)
            WHERE ('0x' || substr(md5('prep_' || doc_id), 1, 15))::BIGINT % 10000 < rates.bps
          )
          SELECT 1 AS stage_idx, 'raw' AS stage, COUNT(1) AS n_docs,
                 CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS n_chars FROM documents
          UNION ALL
          SELECT 2, 'dedup', COUNT(1), CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) FROM k1
          UNION ALL
          SELECT 3, 'bench_drop', COUNT(1), CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) FROM nb
          UNION ALL
          SELECT 4, 'decontaminated', COUNT(1), CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) FROM k2
          UNION ALL
          SELECT 5, 'rebalanced', COUNT(1), CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) FROM k3""",

    // Adjacent char pairs within whitespace words, counted corpus-wide.
    "q161_bpe_pair_counts" ->
      """WITH w AS (
           SELECT unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents
         ),
         p AS (
           SELECT unnest(CASE WHEN length(w) >= 2
                              THEN list_transform(generate_series(1, length(w) - 1),
                                     i -> substr(w, i, 2))
                              ELSE []::VARCHAR[] END) AS pair
           FROM w
         ),
         c AS (SELECT pair, CAST(COUNT(1) AS BIGINT) AS cnt FROM p GROUP BY 1),
         r AS (SELECT pair, cnt, row_number() OVER (ORDER BY cnt DESC, pair ASC) AS rk FROM c)
         SELECT pair, cnt, CAST(rk AS INT) AS rk FROM r WHERE rk <= 50""",

    // Shingle document frequency over the (already doc-distinct)
    // shared shingle relation, top 20.
    "q162_boilerplate_shingles" ->
      s"""WITH $shinglesCte,
          c AS (SELECT s, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM sh GROUP BY 1),
          r AS (SELECT s, df, row_number() OVER (ORDER BY df DESC, s ASC) AS rk FROM c)
          SELECT s, df, CAST(rk AS INT) AS rk FROM r WHERE rk <= 20""",

    // Perceptual aHash recomputed from the closed-form image manifest
    // (like q40/q49): 8×8 integer block means of the luma, threshold
    // vs the grid mean (strict >), bit k = cell k. Bit 63 cannot be
    // built as 1<<63 in DuckDB (overflow error) — it is the BIGINT
    // min literal, which equals the two's-complement value Spark's
    // `1L << 63` produces.
    "q163_image_ahash" ->
      s"""WITH $aHashCte
          SELECT doc_id, sh FROM shs""",

    // Exact all-pairs image near-dups at hamming ≤ 3 over the aHash:
    // the engine's 8-band pigeonhole join is EXACT up to hamming 7,
    // so the oracle may compare against ground truth, not a candidate
    // mirror.
    "q164_image_neardup" ->
      s"""WITH $aHashCte
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
          FROM shs a JOIN shs b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.sh, b.sh)) <= 3""",

    // q171: q164 over keep-min representatives of each distinct hash —
    // the exact-layer-first production pair shape. Reps are one per
    // distinct sh, so every oracle pair has hamming ≥ 1 and the
    // engine's 8-band pigeonhole (exact to hamming 7) still covers it.
    "q171_image_neardup_distinct" ->
      s"""WITH $aHashCte,
          reps AS (SELECT sh, MIN(doc_id) AS doc_id FROM shs GROUP BY 1)
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
          FROM reps a JOIN reps b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.sh, b.sh)) <= 3""",

    // Inter-source shingle overlap: doc-distinct shingles from the
    // shared CTE deduped to (source, shingle), pair-counted.
    "q167_source_overlap" ->
      s"""WITH $shinglesCte,
          ssrc AS (SELECT DISTINCT d.source, sh.s FROM sh JOIN documents d USING (doc_id)),
          tot AS (SELECT source, CAST(COUNT(1) AS BIGINT) AS n FROM ssrc GROUP BY 1),
          ov AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(COUNT(1) AS BIGINT) AS n_shared
            FROM ssrc a JOIN ssrc b ON a.s = b.s AND a.source < b.source
            GROUP BY 1, 2
          )
          SELECT source_a, source_b, ta.n AS n_a, tb.n AS n_b, n_shared,
                 CAST(n_shared * 1000000 // LEAST(ta.n, tb.n) AS BIGINT) AS containment_ppm
          FROM ov
          JOIN tot ta ON ta.source = ov.source_a
          JOIN tot tb ON tb.source = ov.source_b""",

    // q172: q167 over the df-capped shingle universe — shingles in
    // more than 4 documents are dropped BEFORE the (source, shingle)
    // dedup, and the per-source totals count only survivors (true
    // containment of the reduced sets, the jaccardPairsFromRows rule).
    "q172_source_overlap_capped" ->
      s"""WITH $shinglesCte,
          keep AS (SELECT s FROM sh GROUP BY s HAVING COUNT(DISTINCT doc_id) <= 4),
          shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)),
          ssrc AS (SELECT DISTINCT d.source, shc.s FROM shc JOIN documents d USING (doc_id)),
          tot AS (SELECT source, CAST(COUNT(1) AS BIGINT) AS n FROM ssrc GROUP BY 1),
          ov AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(COUNT(1) AS BIGINT) AS n_shared
            FROM ssrc a JOIN ssrc b ON a.s = b.s AND a.source < b.source
            GROUP BY 1, 2
          )
          SELECT source_a, source_b, ta.n AS n_a, tb.n AS n_b, n_shared,
                 CAST(n_shared * 1000000 // LEAST(ta.n, tb.n) AS BIGINT) AS containment_ppm
          FROM ov
          JOIN tot ta ON ta.source = ov.source_a
          JOIN tot tb ON tb.source = ov.source_b""",

    // q173: URL frontier — the closed-form URL manifest recomputed in
    // SQL, then the canonicalizer mirrored operator by operator
    // (fragment strip, lowercase scheme/host, default-port strip,
    // tracking-param drop, param sort, empty path → '/').
    "q173_url_frontier" ->
      ("WITH " + urlCanonCtes + """
         SELECT canonical_url, MIN(doc_id) AS keeper_id,
                CAST(COUNT(1) AS BIGINT) AS n_variants
         FROM c GROUP BY 1"""),

    // q181: the same canonicalization chain rolled to the per-HOST
    // reputation table — raw fetches vs distinct canonical pages.
    "q181_domain_reputation" ->
      ("WITH " + urlCanonCtes + """,
         h AS (
           SELECT regexp_extract(canonical_url, '^[a-z][a-z0-9+.-]*://([^/?]+)', 1) AS host,
                  canonical_url
           FROM c
         ),
         g AS (SELECT host, canonical_url, COUNT(1) AS nf FROM h GROUP BY 1, 2)
         SELECT host,
                CAST(SUM(nf) AS BIGINT) AS n_fetches,
                CAST(COUNT(1) AS BIGINT) AS n_pages,
                CAST(((SUM(nf) - COUNT(1)) * 1000000) // SUM(nf) AS BIGINT) AS dup_fetch_ppm
         FROM g GROUP BY 1"""),

    // q177: snapshot diff — null-safe payload comparison mirrors the
    // engine's `<=>`.
    "q177_snapshot_diff" ->
      ("WITH " + snapshotCtes + """
         SELECT COALESCE(o.doc_id, n.doc_id) AS snap_id,
                CASE WHEN o.doc_id IS NULL THEN 'added'
                     WHEN n.doc_id IS NULL THEN 'removed'
                     WHEN o.p IS NOT DISTINCT FROM n.p THEN 'unchanged'
                     ELSE 'changed' END AS status
         FROM snap_o o FULL OUTER JOIN snap_n n ON o.doc_id = n.doc_id"""),

    // q178: modality coverage — docs with an embedding (vec_id keyed
    // to doc_id), exact ppm per source.
    "q178_modality_coverage" ->
      """WITH ids AS (SELECT DISTINCT vec_id FROM embeddings)
         SELECT d.source AS grp,
                CAST(COUNT(1) AS BIGINT) AS n_rows,
                CAST(COUNT(ids.vec_id) AS BIGINT) AS n_covered,
                CAST((COUNT(ids.vec_id) * 1000000) // COUNT(1) AS BIGINT) AS coverage_ppm
         FROM documents d LEFT JOIN ids ON d.doc_id = ids.vec_id
         GROUP BY 1""",

    // q179: curation lineage — ALL gates independently into a reason
    // bitmask (bit set = gate failed): 1 dedup-loser, 2 benchmark
    // source, 4 contaminated, 8 length out of [100, 450]. The keep
    // set is q153's keep CTE; contamination is q58's flag set.
    "q179_curation_lineage" ->
      (s"""WITH RECURSIVE $verdictCtes,
          keep AS (
            SELECT doc_id FROM j WHERE doc_id = COALESCE(cluster_min, exact_keeper)
          ),""" + """
          cw AS (
            SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS ws FROM documents
          ),
          cgr AS (
            SELECT doc_id, source,
                   CASE WHEN len(ws) >= 5
                        THEN list_distinct(list_transform(generate_series(1, len(ws)-4),
                               i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]))
                        ELSE []::VARCHAR[] END AS gs
            FROM cw
          ),
          cex AS (SELECT doc_id, source, unnest(gs) AS s FROM cgr),
          cbg AS (SELECT DISTINCT s FROM cex WHERE source = 'src0'),
          contam AS (
            SELECT DISTINCT e.doc_id FROM cex e JOIN cbg ON e.s = cbg.s
            WHERE e.source <> 'src0'
          ),
          m AS (
            SELECT d.doc_id,
                   CAST(
                     (CASE WHEN k.doc_id IS NULL THEN 1 ELSE 0 END)
                     + (CASE WHEN NOT COALESCE(d.source <> 'src0', FALSE) THEN 2 ELSE 0 END)
                     + (CASE WHEN cm.doc_id IS NOT NULL THEN 4 ELSE 0 END)
                     + (CASE WHEN NOT COALESCE(d.n_chars BETWEEN 100 AND 450, FALSE) THEN 8 ELSE 0 END)
                   AS BIGINT) AS reason_mask
            FROM documents d
            LEFT JOIN keep k ON k.doc_id = d.doc_id
            LEFT JOIN contam cm ON cm.doc_id = d.doc_id
          )
          SELECT doc_id, reason_mask, (reason_mask = 0) AS admitted FROM m"""),

    // q182: incremental re-curation — the diff's added/changed docs
    // probed against the OLD snapshot's exact-fingerprint index.
    "q182_incremental_recurate" ->
      ("WITH " + snapshotCtes + """,
         d AS (
           SELECT COALESCE(o.doc_id, n.doc_id) AS snap_id,
                  CASE WHEN o.doc_id IS NULL THEN 'added'
                       WHEN n.doc_id IS NULL THEN 'removed'
                       WHEN o.p IS NOT DISTINCT FROM n.p THEN 'unchanged'
                       ELSE 'changed' END AS status,
                  n.p AS np
           FROM snap_o o FULL OUTER JOIN snap_n n ON o.doc_id = n.doc_id
         ),
         wl AS (SELECT snap_id, status, np FROM d WHERE status IN ('added', 'changed')),
         ofp AS (
           SELECT md5(regexp_replace(lower(p), '[^a-z0-9]+', '', 'g')) AS fp,
                  MIN(doc_id) AS keeper_id
           FROM snap_o GROUP BY 1
         )
         SELECT wl.snap_id, wl.status,
                CASE WHEN ofp.keeper_id IS NOT NULL THEN 'drop_exact' ELSE 'admit' END AS verdict,
                ofp.keeper_id
         FROM wl LEFT JOIN ofp
           ON md5(regexp_replace(lower(wl.np), '[^a-z0-9]+', '', 'g')) = ofp.fp"""),

    // q183: embedding-population drift per IVF cell under the FIXED
    // trained codebook (q61's kmeans chain) between the vec-snapshot
    // versions (%7 / %11 residue scheme, as the doc snapshots).
    "q183_embedding_drift" ->
      (s"""WITH $quantCte,
          $kmeansCte,
          cc2 AS (
            SELECT en.vec_id, c.cell,
                   ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
            FROM en, cn c
          ),
          a AS (
            SELECT vec_id, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc2) WHERE rn = 1
          ),""" + """
          ob AS (SELECT cell, COUNT(1) AS cn_ FROM a WHERE vec_id % 7 <> 0 GROUP BY 1),
          ot AS (SELECT SUM(cn_) AS t FROM ob),
          os AS (SELECT cell, CAST((cn_ * 1000000) // t AS BIGINT) AS old_ppm FROM ob, ot),
          nb AS (SELECT cell, COUNT(1) AS cn_ FROM a WHERE vec_id % 11 <> 3 GROUP BY 1),
          nt AS (SELECT SUM(cn_) AS t FROM nb),
          ns AS (SELECT cell, CAST((cn_ * 1000000) // t AS BIGINT) AS new_ppm FROM nb, nt)
          SELECT COALESCE(os.cell, ns.cell) AS cell,
                 COALESCE(old_ppm, 0) AS old_ppm,
                 COALESCE(new_ppm, 0) AS new_ppm,
                 ABS(COALESCE(new_ppm, 0) - COALESCE(old_ppm, 0)) AS delta_ppm
          FROM os FULL OUTER JOIN ns ON os.cell = ns.cell"""),

    // q180: length drift between the snapshot versions — per 64-char
    // bucket, exact-ppm shares + absolute delta.
    "q180_length_drift" ->
      ("WITH " + snapshotCtes + """,
         ob AS (SELECT LEAST(length(p) // 64, 9) AS bucket, COUNT(1) AS cn FROM snap_o GROUP BY 1),
         ot AS (SELECT SUM(cn) AS t FROM ob),
         os AS (SELECT bucket, CAST((cn * 1000000) // t AS BIGINT) AS old_ppm FROM ob, ot),
         nb AS (SELECT LEAST(length(p) // 64, 9) AS bucket, COUNT(1) AS cn FROM snap_n GROUP BY 1),
         nt AS (SELECT SUM(cn) AS t FROM nb),
         ns AS (SELECT bucket, CAST((cn * 1000000) // t AS BIGINT) AS new_ppm FROM nb, nt)
         SELECT CAST(COALESCE(os.bucket, ns.bucket) AS BIGINT) AS bucket,
                COALESCE(old_ppm, 0) AS old_ppm,
                COALESCE(new_ppm, 0) AS new_ppm,
                ABS(COALESCE(new_ppm, 0) - COALESCE(old_ppm, 0)) AS delta_ppm
         FROM os FULL OUTER JOIN ns ON os.bucket = ns.bucket"""),

    // q175: BPE apply via the sentinel trick — each word becomes
    // '|c1||c2|…|cn|' and a merge (l, r) is the global replace
    // '|l||r|' → '|lr|' (left-to-right non-overlapping = the greedy
    // BPE rule); safe because the corpus alphabet is a–y + space and
    // '|' never occurs. Independent of the engine's sequential kernel.
    "q175_bpe_segmentation" ->
      """WITH w AS (
           SELECT doc_id,
                  list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS ws
           FROM documents
         ),
         seg AS (
           SELECT doc_id,
                  flatten(list_transform(ws, w ->
                    string_split(
                      trim(
                        replace(replace(replace(replace(replace(
                          '|' || array_to_string(string_split(w, ''), '||') || '|',
                          '|t||h|', '|th|'),
                          '|th||e|', '|the|'),
                          '|a||n|', '|an|'),
                          '|i||n|', '|in|'),
                          '|e||r|', '|er|'),
                        '|'),
                      '||'))) AS subs
           FROM w
         )
         SELECT doc_id, CAST(len(subs) AS BIGINT) AS n_subwords,
                array_to_string(subs, ' ') AS seg_text
         FROM seg""",

    // q174: preference pairs — q38's score expression per doc, then
    // per-(source, lang) best-vs-worst with deterministic tie-breaks
    // (score, then lowest doc_id) and the raw double margin.
    "q174_preference_pairs" ->
      s"""WITH $wordsCte,
          m AS (
            SELECT doc_id,
                   least(1.0, len(ws) / 100.0) * 0.5
                     + least(1.0, (CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','in','to','is','that','it','for'))) AS DOUBLE) / len(ws)) * 4) * 0.3
                     + CASE WHEN CAST(list_aggregate(list_transform(ws, w -> length(w)), 'sum') AS DOUBLE) / len(ws) BETWEEN 3.0 AND 8.0 THEN 0.2 ELSE 0.0 END
                     AS quality_score
            FROM words
          ),
          r AS (
            SELECT d.source, d.lang, m.doc_id, m.quality_score,
                   row_number() OVER (PARTITION BY d.source, d.lang
                     ORDER BY m.quality_score DESC, m.doc_id ASC) AS rt,
                   row_number() OVER (PARTITION BY d.source, d.lang
                     ORDER BY m.quality_score ASC, m.doc_id ASC) AS rb
            FROM m JOIN documents d USING (doc_id)
          )
          SELECT c.source, c.lang,
                 c.doc_id AS chosen_doc_id, c.quality_score AS chosen_score,
                 j.doc_id AS rejected_doc_id, j.quality_score AS rejected_score,
                 c.quality_score - j.quality_score AS margin
          FROM r c
          JOIN r j ON c.source = j.source AND c.lang = j.lang
          WHERE c.rt = 1 AND j.rb = 1 AND c.doc_id <> j.doc_id""",

    // Tokenizer fertility: same whitespace-word convention as
    // wordsCte; subwords = letter runs | digit runs | single symbols
    // (the engine's bpeTokens regex, RE2-compatible).
    "q168_token_fertility" ->
      """SELECT lang,
                CAST(COUNT(1) AS BIGINT) AS n_docs,
                CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_words,
                CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS n_subwords,
                CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) * 1000000
                     // GREATEST(SUM(len(string_split_regex(trim(text), '\s+'))), 1) AS BIGINT) AS fertility_ppm
         FROM documents GROUP BY lang""",

    // Image dedup verdicts: exact-keeper by identical hash +
    // recursive-CTE connected components over the exact hamming≤3
    // pairs — q64's verdict chain re-rooted on the aHash relation.
    "q169_image_verdicts" ->
      s"""WITH RECURSIVE $aHashCte,
          apairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM shs a JOIN shs b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sh, b.sh)) <= 3
          ),
          aedges AS (
            SELECT doc_a AS src, doc_b AS dst FROM apairs
            UNION
            SELECT doc_b, doc_a FROM apairs
          ),
          areach AS (
            SELECT DISTINCT src AS doc_id, src AS r FROM aedges
            UNION
            SELECT e.src, r.r FROM aedges e JOIN areach r ON r.doc_id = e.dst
          ),
          aclus AS (SELECT doc_id, MIN(r) AS cluster_min FROM areach GROUP BY doc_id),
          aek AS (SELECT sh, MIN(doc_id) AS exact_keeper FROM shs GROUP BY 1),
          aj AS (
            SELECT s.doc_id, aek.exact_keeper, aclus.cluster_min
            FROM shs s JOIN aek USING (sh) LEFT JOIN aclus USING (doc_id)
          )
          SELECT doc_id,
                 COALESCE(cluster_min, exact_keeper) AS survivor_doc_id,
                 CASE WHEN doc_id = COALESCE(cluster_min, exact_keeper) THEN 'keep'
                      WHEN doc_id <> exact_keeper THEN 'drop_exact'
                      ELSE 'drop_near' END AS verdict
          FROM aj""",

    // Image dedup yield: q169's verdict relation rolled to counts +
    // exact-ppm shares.
    "q170_image_yield" ->
      s"""WITH RECURSIVE $aHashCte,
          apairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM shs a JOIN shs b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sh, b.sh)) <= 3
          ),
          aedges AS (
            SELECT doc_a AS src, doc_b AS dst FROM apairs
            UNION
            SELECT doc_b, doc_a FROM apairs
          ),
          areach AS (
            SELECT DISTINCT src AS doc_id, src AS r FROM aedges
            UNION
            SELECT e.src, r.r FROM aedges e JOIN areach r ON r.doc_id = e.dst
          ),
          aclus AS (SELECT doc_id, MIN(r) AS cluster_min FROM areach GROUP BY doc_id),
          aek AS (SELECT sh, MIN(doc_id) AS exact_keeper FROM shs GROUP BY 1),
          aj AS (
            SELECT s.doc_id, aek.exact_keeper, aclus.cluster_min
            FROM shs s JOIN aek USING (sh) LEFT JOIN aclus USING (doc_id)
          ),
          v AS (
            SELECT CASE WHEN doc_id = COALESCE(cluster_min, exact_keeper) THEN 'keep'
                        WHEN doc_id <> exact_keeper THEN 'drop_exact'
                        ELSE 'drop_near' END AS verdict
            FROM aj
          ),
          c AS (SELECT verdict, CAST(COUNT(1) AS BIGINT) AS n_images FROM v GROUP BY 1)
          SELECT verdict, n_images,
                 CAST(n_images * 1000000 // SUM(n_images) OVER () AS BIGINT) AS share_ppm
          FROM c""",

    // Incremental image probe: exact membership truth over the aHash
    // CTE (8 bands cover all 64 bits up to hamming 7, so the banded
    // engine plan equals exact truth at hamming 3).
    "q166_image_probe" ->
      s"""WITH $aHashCte
          SELECT a.doc_id AS doc_id, b.doc_id AS index_id,
                 CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
          FROM shs a JOIN shs b
            ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
          WHERE bit_count(xor(a.sh, b.sh)) <= 3""",

    // kNN label audit over the trained codebook: q96's assignment,
    // within-cell neighbor pairs BOTH directions, top-5 by (cos desc,
    // bid asc), neighbor-label vote vs own label.
    "q165_label_audit" ->
      s"""WITH $quantCte,
          $kmeansCte,
          cc2 AS (
            SELECT en.vec_id, c.cell,
                   ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
            FROM en, cn c
          ),
          asg AS (
            SELECT vec_id, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc2) WHERE rn = 1
          ),
          lab AS (SELECT vec_id, label FROM embeddings),
          m AS (
            SELECT en.vec_id, en.v, en.n2, asg.cell, lab.label
            FROM en JOIN asg USING (vec_id) JOIN lab USING (vec_id)
          ),
          nb AS (
            SELECT a.vec_id, a.label, b.vec_id AS bid, b.label AS nb_label,
                   ${cosSql("a.v", "b.v", "a.n2", "b.n2")} AS cos
            FROM m a JOIN m b ON a.cell = b.cell AND a.vec_id <> b.vec_id
          ),
          tops AS (
            SELECT * FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, bid ASC) AS rn
              FROM nb) WHERE rn <= 5
          ),
          agg AS (
            SELECT vec_id, CAST(COUNT(1) AS BIGINT) AS n_neighbors,
                   CAST(SUM(CASE WHEN nb_label = label THEN 1 ELSE 0 END) AS BIGINT) AS n_same_label
            FROM tops GROUP BY 1
          )
          SELECT lab.vec_id, lab.label,
                 CAST(COALESCE(n_neighbors, 0) AS BIGINT) AS n_neighbors,
                 CAST(COALESCE(n_same_label, 0) AS BIGINT) AS n_same_label,
                 (COALESCE(n_neighbors, 0) > 0 AND
                  COALESCE(n_same_label, 0) * 2 < COALESCE(n_neighbors, 0)) AS suspect
          FROM lab LEFT JOIN agg USING (vec_id)""",

    // q102's ADC chain at kCand=20, then exact cosine re-rank of only
    // those candidates to the top-5 (IVFADC's "+R" refine).
    "q159_pq_rerank" ->
      s"""WITH $quantCte,
          $pqCte,
          dt AS (
            SELECT vec_id AS qid, sub, cell AS code, d2 AS qd2
            FROM pd2 WHERE vec_id IN (0, 1, 2, 3, 4)
          ),
          sc AS (
            SELECT dt.qid, p.vec_id AS cid, CAST(SUM(dt.qd2) AS BIGINT) AS adc_dist2
            FROM pcodes p JOIN dt ON dt.sub = p.sub AND dt.code = p.code
            WHERE p.vec_id <> dt.qid
            GROUP BY 1, 2
          ),
          cand AS (
            SELECT qid, cid FROM (
              SELECT qid, cid,
                     row_number() OVER (PARTITION BY qid ORDER BY adc_dist2 ASC, cid ASC) AS rk
              FROM sc) WHERE rk <= 20
          ),
          rr AS (
            SELECT c.qid, c.cid,
                   ${cosSql("q.v", "e2.v", "q.n2", "e2.n2")} AS cosine
            FROM cand c
            JOIN en q ON q.vec_id = c.qid
            JOIN en e2 ON e2.vec_id = c.cid
          )
          SELECT qid, cid, cosine, CAST(rk AS INT) AS rk FROM (
            SELECT qid, cid, cosine,
                   row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
            FROM rr) WHERE rk <= 5""",

    // One-row corpus summary; exact-dup rate under the keep-min
    // keeper contract (q30's fingerprint).
    "q160_dataset_card" ->
      """WITH b AS (
           SELECT doc_id, source, lang, n_chars,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nt,
                  md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS fp
           FROM documents
         ),
         k AS (SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS keeper FROM b)
         SELECT CAST(COUNT(1) AS BIGINT) AS n_docs,
                CAST(SUM(nt) AS BIGINT) AS n_tokens,
                CAST(SUM(n_chars) AS BIGINT) AS n_chars,
                CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
                CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
                CAST((CAST(SUM(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
                     // COUNT(1) AS BIGINT) AS dup_doc_ppm,
                CAST(SUM(nt) AS BIGINT) // COUNT(1) AS mean_doc_tokens
         FROM k""",

    // q53's cluster labels rolled into a size histogram; singletons
    // (docs in no near-dup cluster) are the size-1 row.
    "q157_cluster_histogram" ->
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
          cl AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
          sz AS (SELECT cluster_id, CAST(COUNT(1) AS BIGINT) AS cluster_size FROM cl GROUP BY 1),
          multi AS (SELECT cluster_size, CAST(COUNT(1) AS BIGINT) AS n_clusters FROM sz GROUP BY 1),
          singles AS (
            SELECT CAST(COUNT(1) AS BIGINT) AS n_clusters FROM documents d
            WHERE NOT EXISTS (SELECT 1 FROM cl WHERE cl.doc_id = d.doc_id))
          SELECT cluster_size, n_clusters,
                 CAST(cluster_size * n_clusters AS BIGINT) AS n_docs
          FROM multi
          UNION ALL
          SELECT CAST(1 AS BIGINT), n_clusters, n_clusters FROM singles""",

    // One more Lloyd round over the trained codebook `cn` — the direct
    // full-corpus recompute the incremental merge must equal exactly.
    "q158_codebook_refresh" ->
      s"""WITH $quantCte,
          $kmeansCte,
          cc2 AS (
            SELECT en.vec_id, c.cell,
                   ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
            FROM en, cn c),
          a2 AS (
            SELECT vec_id, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc2) WHERE rn = 1),
          comp2 AS (
            SELECT a2.cell, generate_subscripts(en.v, 1) AS i, unnest(en.v) AS x
            FROM en JOIN a2 USING (vec_id))
          SELECT cell, CAST(i - 1 AS INT) AS i,
                 CAST(trunc(CAST(SUM(x) AS DOUBLE) / COUNT(1)) AS BIGINT) AS cx
          FROM comp2 GROUP BY cell, i""",

    // q125's audit restricted to the deterministic 50% query sample
    // (gate = md5-hash of 'audit_<qid>' mod 10000 < 5000).
    "q155_sampled_ann_audit" ->
      s"""WITH $quantCte,
          tq AS (
            SELECT vec_id AS qid, v AS qv, n2 AS qn2 FROM en
            WHERE vec_id IN (0,1,2,3,4)
              AND ('0x' || substr(md5('audit_' || vec_id), 1, 15))::BIGINT % 10000 < 5000),
          tscored AS (
            SELECT tq.qid, c.vec_id AS cid,
                   ${cosSql("tq.qv", "c.v", "tq.qn2", "c.n2")} AS cosine
            FROM en c, tq WHERE c.vec_id <> tq.qid),
          truth AS (
            SELECT qid, cid FROM (
              SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
              FROM tscored) WHERE rk <= 5),
          cents AS (SELECT vec_id AS cell, v AS cv, n2 AS cn2 FROM en WHERE vec_id < 16),
          cc AS (
            SELECT en.vec_id, en.v, en.n2, c.cell,
                   ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
            FROM en, cents c),
          assigned AS (
            SELECT vec_id, v, n2, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc) WHERE rn = 1),
          probes AS (
            SELECT vec_id AS qid, v AS qv, n2 AS qn2, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc WHERE vec_id IN (0,1,2,3,4)
                AND ('0x' || substr(md5('audit_' || vec_id), 1, 15))::BIGINT % 10000 < 5000)
            WHERE rn <= 2),
          ascored AS (
            SELECT p.qid, a.vec_id AS cid,
                   ${cosSql("p.qv", "a.v", "p.qn2", "a.n2")} AS cosine
            FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.qid),
          approx AS (
            SELECT qid, cid FROM (
              SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
              FROM ascored) WHERE rk <= 5)
          SELECT t.qid, COUNT(1) AS n_truth, COUNT(a.cid) AS n_hit,
                 CAST((COUNT(a.cid) * 1000000) // COUNT(1) AS BIGINT) AS recall_ppm
          FROM truth t LEFT JOIN approx a ON a.qid = t.qid AND a.cid = t.cid
          GROUP BY 1""",

    // q99's exact pair relation restricted to the deterministic 50%
    // doc_a anchor sample — the q156 truth side as a row-level export.
    "q215_sampled_truth_pairs" ->
      s"""WITH $shinglesCte,
          sizes AS (SELECT doc_id, COUNT(1) AS n FROM sh GROUP BY 1),
          inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(1) AS i
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
          )
          SELECT da AS doc_a, db AS doc_b,
                 CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
          FROM inter
          JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
          WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
            AND ('0x' || substr(md5('audit_' || da), 1, 15))::BIGINT % 10000 < 5000""",

    // q156's audit over exact-dedup KEEPER REPS only (min doc_id per
    // normalized-text fingerprint): the rep-collapsed shingle base,
    // then the identical sampled truth-vs-LSH compare.
    "q216_sampled_audit_reps" ->
      """WITH reps AS (
           SELECT MIN(doc_id) AS doc_id
           FROM documents
           GROUP BY md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g'))
         ),
         words AS (
           SELECT d.doc_id, string_split_regex(trim(d.text), '\s+') AS ws
           FROM documents d JOIN reps USING (doc_id)
         ),
         sh0 AS (
           SELECT doc_id,
                  CASE WHEN len(ws) >= 3
                       THEN list_distinct(list_transform(generate_series(1, len(ws)-2),
                              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                       ELSE []::VARCHAR[] END AS sh
           FROM words
         ),
         sh AS (SELECT doc_id, unnest(sh) AS s FROM sh0),
         hs AS (
           SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS h FROM sh
         ),
         sig AS (
           SELECT doc_id, k,
                  MIN(( (((k+1)*2654435761) % 2147483647) * h
                        + (((k+7)*976369) % 2147483647) ) % 2147483647) AS minhash
           FROM hs, (SELECT unnest(generate_series(0, 15)) AS k)
           GROUP BY doc_id, k
         ),
         sizes AS (SELECT doc_id, COUNT(1) AS n FROM sh GROUP BY 1),
         tinter AS (
           SELECT a.doc_id AS da, b.doc_id AS db, COUNT(1) AS i
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2
         ),
         truth AS (
           SELECT da, db FROM tinter
           JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
           WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
             AND ('0x' || substr(md5('audit_' || da), 1, 15))::BIGINT % 10000 < 5000
         ),
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
         est AS (
           SELECT c.da, c.db
           FROM cand c
           JOIN sig sa ON sa.doc_id = c.da
           JOIN sig sb ON sb.doc_id = c.db AND sb.k = sa.k
           GROUP BY 1, 2
           HAVING COUNT(CASE WHEN sa.minhash = sb.minhash THEN 1 END) / 16.0 >= 0.5
         ),
         linter AS (
           SELECT e.da, e.db, COUNT(1) AS i
           FROM est e
           JOIN sh a ON a.doc_id = e.da
           JOIN sh b ON b.doc_id = e.db AND b.s = a.s
           GROUP BY 1, 2
         ),
         lsh AS (
           SELECT l.da, l.db FROM linter l
           JOIN sizes sa ON sa.doc_id = l.da JOIN sizes sb ON sb.doc_id = l.db
           WHERE CAST(l.i AS DOUBLE) / (sa.n + sb.n - l.i) >= 0.8
             AND ('0x' || substr(md5('audit_' || l.da), 1, 15))::BIGINT % 10000 < 5000
         ),
         j AS (
           SELECT CAST(COUNT(CASE WHEN t.da IS NOT NULL AND l.da IS NOT NULL THEN 1 END) AS BIGINT) AS tp,
                  CAST(COUNT(CASE WHEN t.da IS NOT NULL AND l.da IS NULL THEN 1 END) AS BIGINT) AS fn,
                  CAST(COUNT(CASE WHEN t.da IS NULL AND l.da IS NOT NULL THEN 1 END) AS BIGINT) AS fp
           FROM truth t FULL OUTER JOIN lsh l ON t.da = l.da AND t.db = l.db
         )
         SELECT tp + fn AS n_truth, tp + fp AS n_candidate, tp, fn, fp,
                (tp * 1000000) // greatest(tp + fn, 1) AS recall_ppm,
                (tp * 1000000) // greatest(tp + fp, 1) AS precision_ppm
         FROM j""",

    // q112's audit with both sides anchor-gated to the deterministic
    // 50% doc_a sample before the compare.
    "q156_sampled_lsh_audit" ->
      s"""WITH $sigCte,
          sizes AS (SELECT doc_id, COUNT(1) AS n FROM sh GROUP BY 1),
          tinter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(1) AS i
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
          ),
          truth AS (
            SELECT da, db FROM tinter
            JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
              AND ('0x' || substr(md5('audit_' || da), 1, 15))::BIGINT % 10000 < 5000
          ),
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
          est AS (
            SELECT c.da, c.db
            FROM cand c
            JOIN sig sa ON sa.doc_id = c.da
            JOIN sig sb ON sb.doc_id = c.db AND sb.k = sa.k
            GROUP BY 1, 2
            HAVING COUNT(CASE WHEN sa.minhash = sb.minhash THEN 1 END) / 16.0 >= 0.5
          ),
          linter AS (
            SELECT e.da, e.db, COUNT(1) AS i
            FROM est e
            JOIN sh a ON a.doc_id = e.da
            JOIN sh b ON b.doc_id = e.db AND b.s = a.s
            GROUP BY 1, 2
          ),
          lsh AS (
            SELECT l.da, l.db FROM linter l
            JOIN sizes sa ON sa.doc_id = l.da JOIN sizes sb ON sb.doc_id = l.db
            WHERE CAST(l.i AS DOUBLE) / (sa.n + sb.n - l.i) >= 0.8
              AND ('0x' || substr(md5('audit_' || l.da), 1, 15))::BIGINT % 10000 < 5000
          ),
          j AS (
            SELECT CAST(COUNT(CASE WHEN t.da IS NOT NULL AND l.da IS NOT NULL THEN 1 END) AS BIGINT) AS tp,
                   CAST(COUNT(CASE WHEN t.da IS NOT NULL AND l.da IS NULL THEN 1 END) AS BIGINT) AS fn,
                   CAST(COUNT(CASE WHEN t.da IS NULL AND l.da IS NOT NULL THEN 1 END) AS BIGINT) AS fp
            FROM truth t FULL OUTER JOIN lsh l ON t.da = l.da AND t.db = l.db
          )
          SELECT tp + fn AS n_truth, tp + fp AS n_candidate, tp, fn, fp,
                 (tp * 1000000) // greatest(tp + fn, 1) AS recall_ppm,
                 (tp * 1000000) // greatest(tp + fp, 1) AS precision_ppm
          FROM j""",

    // q156's audit with the pair universe gated on BOTH sides:
    // independent 50% hash gates on doc_a (seed 'audit') and doc_b
    // (seed 'partner'), applied to truth and LSH alike.
    // doc → word-sequence group keeper, restricted to docs long enough
    // to shingle (n=3): the collapse key of the reps-first pair forms.
    "q218_wordseq_reps" ->
      s"""WITH words AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
          ),
          m AS (
            SELECT doc_id, md5(array_to_string(ws, ' ')) AS wfp
            FROM words WHERE len(ws) >= 3
          )
          SELECT doc_id, min(doc_id) OVER (PARTITION BY wfp) AS rep_id FROM m""",

    "q217_two_sided_audit" ->
      s"""WITH $sigCte,
          sizes AS (SELECT doc_id, COUNT(1) AS n FROM sh GROUP BY 1),
          tinter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(1) AS i
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
          ),
          truth AS (
            SELECT da, db FROM tinter
            JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
              AND ('0x' || substr(md5('audit_' || da), 1, 15))::BIGINT % 10000 < 5000
              AND ('0x' || substr(md5('partner_' || db), 1, 15))::BIGINT % 10000 < 5000
          ),
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
          est AS (
            SELECT c.da, c.db
            FROM cand c
            JOIN sig sa ON sa.doc_id = c.da
            JOIN sig sb ON sb.doc_id = c.db AND sb.k = sa.k
            GROUP BY 1, 2
            HAVING COUNT(CASE WHEN sa.minhash = sb.minhash THEN 1 END) / 16.0 >= 0.5
          ),
          linter AS (
            SELECT e.da, e.db, COUNT(1) AS i
            FROM est e
            JOIN sh a ON a.doc_id = e.da
            JOIN sh b ON b.doc_id = e.db AND b.s = a.s
            GROUP BY 1, 2
          ),
          lsh AS (
            SELECT l.da, l.db FROM linter l
            JOIN sizes sa ON sa.doc_id = l.da JOIN sizes sb ON sb.doc_id = l.db
            WHERE CAST(l.i AS DOUBLE) / (sa.n + sb.n - l.i) >= 0.8
              AND ('0x' || substr(md5('audit_' || l.da), 1, 15))::BIGINT % 10000 < 5000
              AND ('0x' || substr(md5('partner_' || l.db), 1, 15))::BIGINT % 10000 < 5000
          ),
          j AS (
            SELECT CAST(COUNT(CASE WHEN t.da IS NOT NULL AND l.da IS NOT NULL THEN 1 END) AS BIGINT) AS tp,
                   CAST(COUNT(CASE WHEN t.da IS NOT NULL AND l.da IS NULL THEN 1 END) AS BIGINT) AS fn,
                   CAST(COUNT(CASE WHEN t.da IS NULL AND l.da IS NOT NULL THEN 1 END) AS BIGINT) AS fp
            FROM truth t FULL OUTER JOIN lsh l ON t.da = l.da AND t.db = l.db
          )
          SELECT tp + fn AS n_truth, tp + fp AS n_candidate, tp, fn, fp,
                 (tp * 1000000) // greatest(tp + fn, 1) AS recall_ppm,
                 (tp * 1000000) // greatest(tp + fp, 1) AS precision_ppm
          FROM j"""
  )

  /** Residual chain for IVF-PQ (mirror of
    * [[graft.operators.Similarity.ivfPqCodebooks]]'s residual
    * relation): coarse assignment against the trained codebook `cn`
    * (cosine argmax, ties to the lowest cell — [[kmeansCte]] in
    * scope), then `renn` = (vec_id, v = residual, n2, coarse_cell).
    * Feed it to [[pqCteOn]]("renn") for the residual PQ chain. */
  private def residCte =
    s"""rc0 AS (
          SELECT en.vec_id, c.cell, ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
          FROM en CROSS JOIN cn c),
        ras AS (
          SELECT vec_id, cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
            FROM rc0) WHERE rn = 1),
        ren AS (
          SELECT en.vec_id, ras.cell AS coarse_cell,
                 list_transform(list_zip(en.v, c.cv), p -> p[1] - p[2]) AS v
          FROM en JOIN ras USING (vec_id) JOIN cn c ON c.cell = ras.cell),
        renn AS (
          SELECT vec_id, coarse_cell, v,
                 CAST(list_aggregate(list_transform(v, x -> x*x), 'sum') AS BIGINT) AS n2
          FROM ren)"""

  /** SQ8 CTE chain (mirror of [[graft.operators.Similarity.sqScales]]/
    * `sqEncode`): `ex` per-(vector, dim) components, `sc` per-dim
    * symmetric scales, `enc` int8 codes. Requires [[quantCte]]'s `en`
    * in scope. */
  private def sqCte =
    s"""ex AS (
          SELECT vec_id, i, v[i + 1] AS x
          FROM en CROSS JOIN (SELECT unnest(generate_series(0, ${EmbDim - 1})) AS i)),
        sc AS (SELECT i, greatest(max(x), -min(x), 1) AS s FROM ex GROUP BY 1),
        enc AS (
          SELECT vec_id, i, s, x,
                 CASE WHEN x < 0 THEN -((254 * abs(x) + s) // (2 * s))
                      ELSE (254 * abs(x) + s) // (2 * s) END AS code
          FROM ex JOIN sc USING (i))"""
}
