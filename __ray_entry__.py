"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on sf0.001;
``queries()`` exposes the full operator catalog from SURVEY.md §2 (each
callable takes ``sf_dir``); ``oracle_sql()`` carries DuckDB oracles with
IDENTICAL column names for every SQL-expressible query.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from tempeh_parser_ray.pipelines import queries as _q


def entry() -> Any:
    """Flagship pipeline: synthesize the CC-style corpus from sf0.001
    documents, run the fused parse+extract actor-pool stage, return the
    extraction Dataset (lazy; driver consumes it)."""
    return _q.extract_text("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    # Ordered so the driver's 50-query correctness budget lands on the
    # queries CORRECTNESS_r01-r04 never covered (VERDICT r4, item 1) plus
    # this round's changed queries; the rest are pinned by prior rounds'
    # driver files and the committed CHECK_r5 full sweep.
    return {
        # round-5 audit order: the 42 queries never driver-covered
        # (CORRECTNESS_r01-r04 cumulative) come first, then the 8 whose
        # implementations changed this round (multimodal trio rerouted to
        # real codecs, doc_novelty rework, VP8L rotation, web_pipeline
        # token carry, URL/robots ADVICE fixes) — so CORRECTNESS_r05's
        # 50-query budget completes the cumulative audit trail.
        "events_running_total": _q.events_running_total,
        "domain_pagerank": _q.domain_pagerank,
        "dsir_weights": _q.dsir_weights,
        "url_parse": _q.url_parse,
        "url_host_stats": _q.url_host_stats,
        "ngram_lm_ppl": _q.ngram_lm_ppl,
        "ppl_buckets": _q.ppl_buckets,
        "semdedup": _q.semdedup,
        "paragraph_dedup": _q.paragraph_dedup,
        "extract_text_warc": _q.extract_text_warc,
        "extract_spans": _q.extract_spans,
        "extract_error_contract": _q.extract_error_contract,
        "doc_freq_score": _q.doc_freq_score,
        "events_json_props": _q.events_json_props,
        "normalize_text": _q.normalize_text,
        "user_sessions_salted": _q.user_sessions_salted,
        "heavy_hitters": _q.heavy_hitters,
        "keyword_search": _q.keyword_search,
        "orders_rollup": _q.orders_rollup,
        "revenue_by_region": _q.revenue_by_region,
        "parts_by_brand": _q.parts_by_brand,
        "sequence_packing": _q.sequence_packing,
        "decontaminate": _q.decontaminate,
        "pii_redact": _q.pii_redact,
        "repetition_ratio": _q.repetition_ratio,
        "stratified_sample_by_lang": _q.stratified_sample_by_lang,
        "source_mixture_sample": _q.source_mixture_sample,
        "events_lag": _q.events_lag,
        "incremental_dedup": _q.incremental_dedup,
        "quality_classifier": _q.quality_classifier,
        "tfidf_search": _q.tfidf_search,
        "above_median_length": _q.above_median_length,
        "image_pixel_stats": _q.image_pixel_stats,
        "cross_doc_repetition": _q.cross_doc_repetition,
        "bpe_train": _q.bpe_train,
        "mixture_plan": _q.mixture_plan,
        "curation_pipeline": _q.curation_pipeline,
        "audio_pcm_stats": _q.audio_pcm_stats,
        "video_duration": _q.video_duration,
        "events_lead": _q.events_lead,
        "sliding_distinct_users": _q.sliding_distinct_users,
        "dedup_minhash_keep_distributed": _q.dedup_minhash_keep_distributed,
        "multimodal_features": _q.multimodal_features,
        "media_resize": _q.media_resize,
        "audio_features": _q.audio_features,
        "doc_novelty": _q.doc_novelty,
        "image_pixel_stats_webp": _q.image_pixel_stats_webp,
        "web_pipeline": _q.web_pipeline,
        "url_canonical_dedup": _q.url_canonical_dedup,
        "image_pixel_stats_vp8": _q.image_pixel_stats_vp8,
        # remainder: pinned by CORRECTNESS_r01-r04 + CHECK_r5 sweep
        # (crawl_schedule yielded its audit slot to the new VP8 query:
        # driver-green in r04 and re-verified by this round's sweep)
        "crawl_schedule": _q.crawl_schedule,
        "corpus_summary": _q.corpus_summary,
        "source_dedup_rate": _q.source_dedup_rate,
        "video_tracks": _q.video_tracks,
        "vocab_coverage": _q.vocab_coverage,
        "token_quantiles_by_lang": _q.token_quantiles_by_lang,
        "orders_cube": _q.orders_cube,
        "doc_length_mad": _q.doc_length_mad,
        "image_pixel_stats_color": _q.image_pixel_stats_color,
        "fold_text": _q.fold_text,
        "lang_confusion": _q.lang_confusion,
        "extract_text_ipc": _q.extract_text_ipc,
        "dataset_split": _q.dataset_split,
        "lang_source_pivot": _q.lang_source_pivot,
        "embedding_cov": _q.embedding_cov,
        "domain_quality": _q.domain_quality,
        "link_degree_hist": _q.link_degree_hist,
        "decode_entities": _q.decode_entities,
        "host_fetch_slots": _q.host_fetch_slots,
        "extract_metadata": _q.extract_metadata,
        "epoch_shuffle": _q.epoch_shuffle,
        "embedding_quantize": _q.embedding_quantize,
        "resolve_links": _q.resolve_links,
        "token_quantiles_sketch": _q.token_quantiles_sketch,
        "sitemap_parse": _q.sitemap_parse,
        "tag_histogram": _q.tag_histogram,
        "crawl_diff": _q.crawl_diff,
        "chunk_documents": _q.chunk_documents,
        "label_centroids": _q.label_centroids,
        "events_funnel": _q.events_funnel,
        "user_retention": _q.user_retention,
        "events_gapfill": _q.events_gapfill,
        "surt_index": _q.surt_index,
        "robots_filter": _q.robots_filter,
        "anchor_text_index": _q.anchor_text_index,
        "latest_capture": _q.latest_capture,
        "dom_stats": _q.dom_stats,
        "dom_select": _q.dom_select,
        "extract_tables": _q.extract_tables,
        "nb_lang_classify": _q.nb_lang_classify,
        "pmi_bigrams": _q.pmi_bigrams,
        "inverted_index": _q.inverted_index,
        "events_value_outliers": _q.events_value_outliers,
        "bpe_encode": _q.bpe_encode,
        "extract_text_pdf": _q.extract_text_pdf,
        "extract_links": _q.extract_links,
        "corpus_filter_funnel": _q.corpus_filter_funnel,
        "extract_text": _q.extract_text,
        "extract_lang_stats": _q.extract_lang_stats,
        "parse_trees": _q.parse_trees,
        "parse_fixture_corpus": _q.parse_fixture_corpus,
        "token_count": _q.token_count,
        "quality_score": _q.quality_score,
        "doc_fingerprint": _q.doc_fingerprint,
        "doc_fingerprint_shingle": _q.doc_fingerprint_shingle,
        "lang_id": _q.lang_id,
        "lang_stats": _q.lang_stats,
        "top_sources": _q.top_sources,
        "events_by_type": _q.events_by_type,
        "dedup_exact": _q.dedup_exact,
        "dedup_minhash": _q.dedup_minhash,
        "dedup_simhash": _q.dedup_simhash,
        "ngram_jaccard_pairs": _q.ngram_jaccard_pairs,
        "knn_cosine": _q.knn_cosine,
        "knn_cosine_lsh": _q.knn_cosine_lsh,
        "knn_cosine_ivf": _q.knn_cosine_ivf,
        "image_header_dims": _q.image_header_dims,
        "frame_offsets": _q.frame_offsets,
        "pricing_summary": _q.pricing_summary,
        "orders_by_nation": _q.orders_by_nation,
        "events_windowed": _q.events_windowed,
        "orders_top10": _q.orders_top10,
        "extract_main_text": _q.extract_main_text,
        "extract_multi_encoding": _q.extract_multi_encoding,
        "token_count_bpe": _q.token_count_bpe,
        "term_doc_freq": _q.term_doc_freq,
        "orders_mktsegment": _q.orders_mktsegment,
        "top_doc_per_lang": _q.top_doc_per_lang,
        "user_sessions": _q.user_sessions,
        "sample_documents": _q.sample_documents,
        "dedup_embedding": _q.dedup_embedding,
        "events_asof_join": _q.events_asof_join,
        "events_range_join": _q.events_range_join,
        "events_sliding_3h": _q.events_sliding_3h,
        "doc_length_percentiles": _q.doc_length_percentiles,
        "approx_distinct_tokens_hll": _q.approx_distinct_tokens_hll,
        "customers_no_urgent_orders": _q.customers_no_urgent_orders,
        "bigram_counts": _q.bigram_counts,
        "distinct_tokens_per_lang": _q.distinct_tokens_per_lang,
        "top3_docs_per_lang": _q.top3_docs_per_lang,
        "label_stats": _q.label_stats,
        "extract_text_jsonl": _q.extract_text_jsonl,
        "token_count_csv": _q.token_count_csv,
        "dedup_minhash_keep": _q.dedup_minhash_keep,
    }


# The synthetic corpus is a pure function of each documents row
# (sources/synthetic.py:page_html), so the extraction output has a
# closed SQL form: extracted text == 'home '||lang||source||' #'||id||text||'contact: mail'.
_EXTRACTED = ("'home ' || lang || source || ' #' || "
              "CAST(doc_id AS VARCHAR) || text || 'contact: mail'")

# SQL twin of the engine's tokenize() (Python str.split). CONTRACT:
# equivalence holds for ASCII-space-delimited text with no edge
# whitespace — the shape the synthetic corpus guarantees. They diverge
# on exotic edges (DuckDB trim() strips only ' ' and RE2 \s is
# ASCII-only, while str.split() handles all Unicode whitespace), so a
# testdata refresh that introduces edge tabs/newlines or U+00A0 must
# update BOTH sides together (e.g. trim(text, ' \t\n\r')).
_TOKENS = r"string_split_regex(trim(text), '\s+')"
_EN_STOP = ("['the','a','of','and','to','in','is','that','it','for',"
            "'was','on','are','with','as']")
_DE_STOP = ("['der','die','das','und','ist','nicht','ein','eine','zu',"
            "'den','mit','von','auf','für']")
_ES_STOP = ("['el','la','de','que','y','en','un','una','es','no','los',"
            "'se','del','por','con']")
_FR_STOP = ("['le','la','les','de','des','et','est','un','une','que',"
            "'dans','pour','qui','sur','pas']")


def _stop_count(stoplist: str, toks: str = "t") -> str:
    return f"len(list_filter({toks}, x -> list_contains({stoplist}, x)))"


# Exhaustive character-5-gram Jaccard pairs over the mutated corpus
# (documents + doc_id%10==0 clones with ' extra' appended) — the closed
# form of the MinHash+LSH+verify pipelines. The length prefilter is the
# exact bound J >= T  =>  min(|A|,|B|) >= T * max(|A|,|B|), applied
# before the expensive list_intersect.
_JACCARD_PAIRS_SQL = r"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text || ' extra' AS text
        FROM documents WHERE doc_id % 10 = 0
    ),
    norm AS (
        SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS t
        FROM corpus
    ),
    sh AS (
        SELECT doc_id,
               CASE WHEN length(t) = 0 THEN CAST([] AS VARCHAR[])
                    WHEN length(t) < 5 THEN [t]
                    ELSE list_distinct([substring(t, CAST(x AS INT), 5)
                                        for x in range(1, length(t) - 3)])
               END AS s
        FROM norm
    ),
    cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE least(len(a.s), len(b.s))
              >= {threshold} * greatest(len(a.s), len(b.s))
    ),
    j AS (
        SELECT id_a, id_b,
               CASE WHEN len(sa) + len(sb) = 0 THEN 1.0
                    ELSE CAST(len(list_intersect(sa, sb)) AS DOUBLE)
                         / (len(sa) + len(sb) - len(list_intersect(sa, sb)))
               END AS jaccard
        FROM cand
    )
    SELECT id_a, id_b, jaccard FROM j
    WHERE jaccard >= {threshold}
    ORDER BY id_a, id_b
"""


def oracle_sql() -> dict[str, str]:
    d = {
        "dataset_split": r"""
            -- hex-lexicographic md5 prefix boundaries (240/8/8 of 256)
            SELECT doc_id,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                             < 'f0' THEN 'train'
                        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                             < 'f8' THEN 'valid'
                        ELSE 'test' END AS split
            FROM documents ORDER BY doc_id
        """,
        "lang_source_pivot": r"""
            SELECT source,
                   CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_de,
                   CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_en,
                   CAST(SUM(CASE WHEN lang = 'es' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_es,
                   CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_fr,
                   CAST(SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_zh,
                   CAST(COUNT(*) AS BIGINT) AS n_total
            FROM documents GROUP BY source ORDER BY source
        """,
        "embedding_cov": r"""
            -- exact integer moments (SUM(BIGINT) is HUGEINT-exact),
            -- population covariance via CAST-to-double then divide
            WITH v AS (SELECT vec_id,
                              generate_subscripts(embedding, 1) - 1
                                  AS pos,
                              CAST(FLOOR(CAST(unnest(embedding)
                                              AS DOUBLE) * 10000 + 0.5)
                                   AS BIGINT) AS iv
                       FROM embeddings),
            p AS (SELECT a.pos AS pos_i, b.pos AS pos_j,
                         COUNT(*) AS n, SUM(a.iv * b.iv) AS sij,
                         SUM(a.iv) AS si, SUM(b.iv) AS sj
                  FROM v a JOIN v b
                      ON a.vec_id = b.vec_id AND a.pos <= b.pos
                  GROUP BY 1, 2)
            SELECT pos_i, pos_j,
                   CAST(n * sij - si * sj AS DOUBLE)
                       / CAST(n * n AS DOUBLE) AS cov
            FROM p ORDER BY pos_i, pos_j
        """,
        "url_canonical_dedup": r"""
            -- the canonical key is the closed-form base url; every
            -- canonical collapses exactly its (base, utm-decorated)
            -- pair, keeper = base doc_id
            SELECT (CASE WHEN doc_id % 3 = 0 THEN 'http'
                         ELSE 'https' END) || '://'
                   || (CASE doc_id % 4 WHEN 0 THEN 'www.'
                            WHEN 1 THEN 'blog.' WHEN 2 THEN ''
                            ELSE 'news.' END)
                   || source || '-site.'
                   || (CASE doc_id % 5 WHEN 0 THEN 'com'
                            WHEN 1 THEN 'org' WHEN 2 THEN 'net'
                            WHEN 3 THEN 'co.uk' ELSE 'com.cn' END)
                   || (CASE WHEN doc_id % 7 = 0 THEN ':8080'
                            ELSE '' END)
                   || (CASE WHEN doc_id % 6 = 0
                            THEN '/' || lang || '/p'
                                 || CAST(doc_id AS VARCHAR) || '/'
                            ELSE '/' || lang || '/a'
                                 || CAST(doc_id % 10 AS VARCHAR)
                                 || '/p' || CAST(doc_id AS VARCHAR)
                       END)
                   || (CASE doc_id % 3
                       WHEN 1 THEN '?ref=' || source
                       WHEN 2 THEN '?ref=' || source || '&q=t'
                                   || CAST(doc_id % 100 AS VARCHAR)
                       ELSE '' END) AS canon_url,
                   doc_id AS keeper,
                   CAST(2 AS BIGINT) AS n_variants
            FROM documents ORDER BY canon_url
        """,
        "domain_quality": f"""
            -- registered domain rebuilt closed-form (public-suffix
            -- reduction of crawl_url's host); mean is ONE float
            -- division over exact int64 operands
            WITH f AS (SELECT
                   source || '-site.'
                   || (CASE doc_id % 5 WHEN 0 THEN 'com'
                        WHEN 1 THEN 'org' WHEN 2 THEN 'net'
                        WHEN 3 THEN 'co.uk' ELSE 'com.cn' END)
                       AS registered_domain,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len({_TOKENS}) END AS BIGINT) AS n_tokens
                   FROM documents)
            SELECT registered_domain,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
                   CAST(SUM(n_tokens) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) AS mean_tokens
            FROM f GROUP BY 1 ORDER BY 1
        """,
        "link_degree_hist": r"""
            -- in-degree histogram over the resolved link targets
            WITH o AS (SELECT doc_id, lang,
                   (CASE WHEN doc_id % 3 = 0 THEN 'http'
                         ELSE 'https' END) || '://'
                   || (CASE doc_id % 4 WHEN 0 THEN 'www.'
                            WHEN 1 THEN 'blog.' WHEN 2 THEN ''
                            ELSE 'news.' END)
                   || source || '-site.'
                   || (CASE doc_id % 5 WHEN 0 THEN 'com'
                            WHEN 1 THEN 'org' WHEN 2 THEN 'net'
                            WHEN 3 THEN 'co.uk' ELSE 'com.cn' END)
                   || (CASE WHEN doc_id % 7 = 0 THEN ':8080'
                            ELSE '' END) AS origin
                   FROM documents),
            e AS (SELECT origin || '/' AS abs_url FROM o
                  UNION ALL
                  SELECT origin || '/l/' || lang FROM o
                  UNION ALL
                  SELECT 'mailto:x@example.com' FROM o),
            deg AS (SELECT abs_url, CAST(COUNT(*) AS BIGINT)
                        AS in_degree FROM e GROUP BY abs_url)
            SELECT in_degree, CAST(COUNT(*) AS BIGINT) AS n_targets
            FROM deg GROUP BY in_degree ORDER BY in_degree
        """,
        "decode_entities": r"""
            -- the injected references are closed-form; single-pass
            -- decode: &amp;lt; -> the five chars &lt; (no double
            -- decode), &unknown; stays literal
            SELECT doc_id,
                   'A & B <x> ' || text || ' AB ' || chr(169)
                       || ' &unknown; &lt;' AS decoded
            FROM documents ORDER BY doc_id
        """,
        "host_fetch_slots": r"""
            -- host rebuilt from the generating row (crawl_url);
            -- slot = rank within host by doc_id
            WITH f AS (SELECT doc_id,
                   (CASE doc_id % 4 WHEN 0 THEN 'www.'
                        WHEN 1 THEN 'blog.' WHEN 2 THEN ''
                        ELSE 'news.' END)
                   || source || '-site.'
                   || (CASE doc_id % 5 WHEN 0 THEN 'com'
                        WHEN 1 THEN 'org' WHEN 2 THEN 'net'
                        WHEN 3 THEN 'co.uk' ELSE 'com.cn' END) AS host
                   FROM documents)
            SELECT doc_id, host,
                   CAST(ROW_NUMBER() OVER (PARTITION BY host
                        ORDER BY doc_id) - 1 AS BIGINT) AS slot
            FROM f ORDER BY doc_id
        """,
        "extract_metadata": r"""
            -- every head field is a closed-form function of the
            -- generating row (sources/synthetic.py:meta_page_html)
            SELECT doc_id,
                   'Doc ' || CAST(doc_id AS VARCHAR) || ' | ' || source
                       AS title,
                   source || ' page ' || CAST(doc_id AS VARCHAR)
                       || ' (' || lang || ')' AS description,
                   'OG ' || CAST(doc_id AS VARCHAR) AS og_title,
                   CASE WHEN doc_id % 9 = 0 THEN 'noindex' ELSE '' END
                       AS robots_meta,
                   'https://' || source || '-site.com/d/'
                       || CAST(doc_id AS VARCHAR) AS canonical,
                   lang AS html_lang
            FROM documents ORDER BY doc_id
        """,
        "epoch_shuffle": r"""
            -- md5(seed:id) keyed permutation; ties by doc_id
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (
                       ORDER BY md5('ep7:' || CAST(doc_id AS VARCHAR)),
                                doc_id) - 1 AS BIGINT) AS global_rank,
                   CAST((ROW_NUMBER() OVER (
                       ORDER BY md5('ep7:' || CAST(doc_id AS VARCHAR)),
                                doc_id) - 1) // 100 AS BIGINT) AS shard,
                   CAST((ROW_NUMBER() OVER (
                       ORDER BY md5('ep7:' || CAST(doc_id AS VARCHAR)),
                                doc_id) - 1) % 100 AS BIGINT)
                       AS shard_pos
            FROM documents
        """,
        "embedding_quantize": r"""
            -- fixed-point floor(v*1e5+0.5) int64 components, per-dim
            -- min/max, pure INTEGER floor-division quantize (levels=255)
            WITH v AS (SELECT vec_id,
                              generate_subscripts(embedding, 1) - 1
                                  AS pos,
                              CAST(FLOOR(CAST(unnest(embedding)
                                              AS DOUBLE) * 100000 + 0.5)
                                   AS BIGINT) AS iv
                       FROM embeddings),
            b AS (SELECT pos, MIN(iv) AS mn,
                         GREATEST(MAX(iv) - MIN(iv), 1) AS span
                  FROM v GROUP BY pos)
            SELECT v.vec_id, CAST(v.pos AS BIGINT) AS pos,
                   ((v.iv - b.mn) * 255) // b.span AS q
            FROM v JOIN b USING (pos) ORDER BY vec_id, pos
        """,
        "resolve_links": r"""
            -- origin rebuilt from the generating row; link 0/1 are
            -- root-relative, link 2 is an absolute mailto
            WITH o AS (SELECT doc_id, lang,
                   (CASE WHEN doc_id % 3 = 0 THEN 'http'
                         ELSE 'https' END) || '://'
                   || (CASE doc_id % 4 WHEN 0 THEN 'www.'
                            WHEN 1 THEN 'blog.' WHEN 2 THEN ''
                            ELSE 'news.' END)
                   || source || '-site.'
                   || (CASE doc_id % 5 WHEN 0 THEN 'com'
                            WHEN 1 THEN 'org' WHEN 2 THEN 'net'
                            WHEN 3 THEN 'co.uk' ELSE 'com.cn' END)
                   || (CASE WHEN doc_id % 7 = 0 THEN ':8080'
                            ELSE '' END) AS origin
                   FROM documents)
            SELECT doc_id, CAST(0 AS BIGINT) AS link_idx,
                   origin || '/' AS abs_url FROM o
            UNION ALL
            SELECT doc_id, CAST(1 AS BIGINT), origin || '/l/' || lang
            FROM o
            UNION ALL
            SELECT doc_id, CAST(2 AS BIGINT), 'mailto:x@example.com'
            FROM o
            ORDER BY doc_id, link_idx
        """,
        "sitemap_parse": r"""
            -- closed-form rebuild of the two-entry synthetic sitemap
            SELECT doc_id, CAST(0 AS BIGINT) AS url_idx,
                   'https://' || source || '-site.com/s/' || doc_id
                       AS loc,
                   '2025-01-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR),
                                      2, '0') AS lastmod
            FROM documents
            UNION ALL
            SELECT doc_id, CAST(1 AS BIGINT),
                   'https://' || source || '-site.com/s/' || doc_id
                       || '/alt',
                   '2025-02-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR),
                                      2, '0')
            FROM documents
            ORDER BY doc_id, url_idx
        """,
        "tag_histogram": r"""
            -- fixed template: one of each element tag per page except
            -- <a> (three)
            SELECT t.tag,
                   CAST(t.per_doc * (SELECT COUNT(*) FROM documents)
                        AS BIGINT) AS n
            FROM (VALUES ('a', 3), ('body', 1), ('footer', 1),
                         ('h1', 1), ('head', 1), ('html', 1),
                         ('main', 1), ('nav', 1), ('p', 1),
                         ('script', 1), ('style', 1), ('title', 1))
                 AS t(tag, per_doc)
            ORDER BY t.tag
        """,
        "crawl_diff": r"""
            -- rebuild both snapshots and FULL OUTER JOIN on url
            WITH a AS (SELECT 'synth://doc/' || doc_id AS url,
                              md5(text) AS fp FROM documents),
            b AS (SELECT 'synth://doc/' || doc_id AS url,
                         md5(CASE WHEN doc_id % 10 = 0
                                  THEN text || ' v2'
                                  ELSE text END) AS fp
                  FROM documents WHERE doc_id % 7 <> 0
                  UNION ALL
                  SELECT 'synth://doc/' || (doc_id + 1000000),
                         md5(text)
                  FROM documents WHERE doc_id % 13 = 0)
            SELECT COALESCE(a.url, b.url) AS url,
                   CASE WHEN a.url IS NULL THEN 'added'
                        WHEN b.url IS NULL THEN 'removed'
                        WHEN a.fp <> b.fp THEN 'changed'
                        ELSE 'same' END AS status
            FROM a FULL OUTER JOIN b ON a.url = b.url
            ORDER BY url
        """,
        "chunk_documents": r"""
            -- sliding 32-token windows every 24 tokens; a window is
            -- emitted iff it starts at 0 or the previous window did
            -- not already cover the end (start - 24 + 32 < n)
            WITH w AS (SELECT doc_id,
                              string_split_regex(trim(text), '\s+')
                                  AS words
                       FROM documents),
            s AS (SELECT doc_id, words, len(words) AS n,
                         unnest(range(0, greatest(len(words), 1), 24))
                             AS start
                  FROM w),
            f AS (SELECT doc_id, start // 24 AS chunk_idx,
                         words[start + 1 : least(start + 32, n)] AS cw
                  FROM s WHERE start = 0 OR start + 8 < n)
            SELECT doc_id, chunk_idx,
                   CAST(len(cw) AS BIGINT) AS n_tokens,
                   array_to_string(cw, ' ') AS chunk_text
            FROM f ORDER BY doc_id, chunk_idx
        """,
        "label_centroids": r"""
            -- fixed-point floor(v*1e5 + 0.5) int64 sums (exact,
            -- order-independent); ONE final float division per cell
            WITH e AS (SELECT label, unnest(embedding) AS v,
                              generate_subscripts(embedding, 1) - 1
                                  AS pos
                       FROM embeddings)
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(pos AS BIGINT) AS pos,
                   CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 100000
                                       + 0.5) AS BIGINT)) AS DOUBLE)
                       / COUNT(*) AS centroid
            FROM e GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "events_funnel": r"""
            -- stage k counts users whose earliest stage-k event
            -- strictly follows their stage-(k-1) min time
            WITH v AS (SELECT user_id, MIN(ts) AS mv FROM events
                       WHERE event_type = 'view' GROUP BY user_id),
            c AS (SELECT e.user_id, MIN(e.ts) AS mc
                  FROM events e JOIN v USING (user_id)
                  WHERE e.event_type = 'click' AND e.ts > v.mv
                  GROUP BY e.user_id),
            p AS (SELECT e.user_id, MIN(e.ts) AS mp
                  FROM events e JOIN c USING (user_id)
                  WHERE e.event_type = 'purchase' AND e.ts > c.mc
                  GROUP BY e.user_id)
            SELECT 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM v
            UNION ALL
            SELECT 'click', CAST(COUNT(*) AS BIGINT) FROM c
            UNION ALL
            SELECT 'purchase', CAST(COUNT(*) AS BIGINT) FROM p
        """,
        "user_retention": r"""
            WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE)
                                AS day FROM events),
            coh AS (SELECT user_id, MIN(day) AS cohort_day
                    FROM act GROUP BY user_id)
            SELECT CAST(coh.cohort_day AS TIMESTAMP) AS cohort_day,
                   CAST(act.day - coh.cohort_day AS BIGINT)
                       AS day_offset,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM act JOIN coh USING (user_id)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "events_gapfill": r"""
            WITH c AS (SELECT date_trunc('hour', ts) AS hour_ts,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1),
            b AS (SELECT MIN(hour_ts) AS mn, MAX(hour_ts) AS mx FROM c),
            g AS (SELECT unnest(generate_series(b.mn, b.mx,
                                INTERVAL 1 HOUR)) AS hour_ts FROM b)
            SELECT g.hour_ts, COALESCE(c.n, 0) AS n_events
            FROM g LEFT JOIN c USING (hour_ts)
            ORDER BY g.hour_ts
        """,
        "surt_index": r"""
            -- closed-form SURT key per generating row
            -- (sources/synthetic.py:crawl_url): reversed host labels
            -- (www stripped), ')', path, sorted query params; scheme
            -- and port dropped
            SELECT doc_id,
                   (CASE doc_id % 5 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                         WHEN 2 THEN 'net' WHEN 3 THEN 'uk,co'
                         ELSE 'cn,com' END)
                   || ',' || source || '-site'
                   || (CASE doc_id % 4 WHEN 1 THEN ',blog'
                            WHEN 3 THEN ',news' ELSE '' END)
                   || ')'
                   || (CASE WHEN doc_id % 6 = 0
                            THEN '/' || lang || '/p' || doc_id || '/'
                            ELSE '/' || lang || '/a' || (doc_id % 10)
                                 || '/p' || doc_id END)
                   || (CASE doc_id % 3 WHEN 0 THEN ''
                            WHEN 1 THEN '?ref=' || source
                            ELSE '?q=t' || (doc_id % 100)
                                 || '&ref=' || source END) AS surt
            FROM documents ORDER BY surt, doc_id
        """,
        "robots_filter": r"""
            -- rule k = (2*source_idx + doc_id%5) % 10 disallows
            -- /*/a{k}/ except the Allow override /*/a{k}/p1
            -- (sources/synthetic.py:robots_txt); pages with the
            -- trailing-slash path shape (doc_id%6=0) have no
            -- a-segment and are always allowed
            SELECT doc_id,
                   (CASE WHEN doc_id % 3 = 0 THEN 'http'
                         ELSE 'https' END) || '://'
                   || (CASE doc_id % 4 WHEN 0 THEN 'www.'
                            WHEN 1 THEN 'blog.' WHEN 2 THEN ''
                            ELSE 'news.' END)
                   || source || '-site.'
                   || (CASE doc_id % 5 WHEN 0 THEN 'com'
                            WHEN 1 THEN 'org' WHEN 2 THEN 'net'
                            WHEN 3 THEN 'co.uk' ELSE 'com.cn' END)
                   || (CASE WHEN doc_id % 7 = 0 THEN ':8080'
                            ELSE '' END)
                   || (CASE WHEN doc_id % 6 = 0
                            THEN '/' || lang || '/p' || doc_id || '/'
                            ELSE '/' || lang || '/a' || (doc_id % 10)
                                 || '/p' || doc_id END)
                   || (CASE doc_id % 3 WHEN 0 THEN ''
                            WHEN 1 THEN '?ref=' || source
                            ELSE '?ref=' || source
                                 || '&q=t' || (doc_id % 100) END) AS url,
                   NOT (doc_id % 6 <> 0
                        AND doc_id % 10 =
                            (2 * CAST(substr(source, 4) AS INTEGER)
                             + doc_id % 5) % 10
                        AND substr(CAST(doc_id AS VARCHAR), 1, 1)
                            <> '1') AS allowed
            FROM documents ORDER BY doc_id
        """,
        "anchor_text_index": r"""
            -- the template's three links per page in closed form
            SELECT '/' AS href, CAST(COUNT(*) AS BIGINT) AS n_refs,
                   CAST(1 AS BIGINT) AS n_distinct_anchors,
                   'home' AS top_anchor
            FROM documents
            UNION ALL
            SELECT 'mailto:x@example.com', CAST(COUNT(*) AS BIGINT),
                   CAST(1 AS BIGINT), 'mail'
            FROM documents
            UNION ALL
            SELECT '/l/' || lang, CAST(COUNT(*) AS BIGINT),
                   CAST(1 AS BIGINT), lang
            FROM documents GROUP BY lang
            ORDER BY href
        """,
        "latest_capture": r"""
            -- the r1 re-crawl (one day later, same url) always wins
            SELECT doc_id, 'synth://doc/' || doc_id AS url,
                   TIMESTAMP '2025-01-02 00:00:00'
                       + to_seconds(doc_id) AS warc_ts,
                   'r1' AS crawl
            FROM documents ORDER BY doc_id
        """,
        "dom_stats": r"""
            -- every metric is a closed-form function of the fixed page
            -- template (sources/synthetic.py:page_html node layout)
            SELECT doc_id,
                   CAST(25 AS INTEGER) AS n_nodes,
                   CAST(14 AS INTEGER) AS n_elements,
                   CAST(10 AS INTEGER) AS n_text_nodes,
                   CAST(3 AS INTEGER) AS n_attrs,
                   CAST(5 AS INTEGER) AS max_depth,
                   CAST(51 + 2 * length(CAST(doc_id AS VARCHAR))
                        + length(lang) + length(source)
                        + length(text) AS BIGINT) AS text_chars,
                   '' AS error
            FROM documents ORDER BY doc_id
        """,
        "dom_select": r"""
            -- selector "nav a": exactly two nav anchors per template
            -- page ('home', then the lang label)
            SELECT doc_id, CAST(0 AS BIGINT) AS match_idx,
                   'a' AS tag, 'home' AS text
            FROM documents
            UNION ALL
            SELECT doc_id, CAST(1 AS BIGINT), 'a', lang
            FROM documents
            ORDER BY doc_id, match_idx
        """,
        "extract_tables": r"""
            -- closed-form rebuild of the synthesized data table
            -- (sources/synthetic.py:table_page_html): header row (k,v)
            -- + rows lang/source/chars; the source value cell nests
            -- <b>source</b>! so its text is source || '!'
            SELECT doc_id, CAST(0 AS BIGINT) AS table_idx,
                   r.row_idx, c.col_idx,
                   CASE
                     WHEN r.row_idx = 0 THEN
                       CASE c.col_idx WHEN 0 THEN 'k' ELSE 'v' END
                     WHEN r.row_idx = 1 THEN
                       CASE c.col_idx WHEN 0 THEN 'lang' ELSE lang END
                     WHEN r.row_idx = 2 THEN
                       CASE c.col_idx WHEN 0 THEN 'source'
                            ELSE source || '!' END
                     ELSE
                       CASE c.col_idx WHEN 0 THEN 'chars'
                            ELSE CAST(n_chars AS VARCHAR) END
                   END AS cell_text,
                   r.row_idx = 0 AS is_header
            FROM documents
            CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS row_idx) r
            CROSS JOIN (SELECT unnest([0, 1]) AS col_idx) c
            ORDER BY doc_id, r.row_idx, c.col_idx
        """,
        "extract_text": f"""
            SELECT doc_id,
                   {_EXTRACTED} AS extracted_text,
                   CAST(length({_EXTRACTED}) AS BIGINT) AS n_chars_extracted,
                   CAST(25 AS INTEGER) AS n_nodes,
                   CAST(3 AS INTEGER) AS n_links,
                   '' AS error
            FROM documents
        """,
        "extract_lang_stats": f"""
            SELECT lang,
                   COUNT(*) AS n_docs,
                   CAST(SUM(length({_EXTRACTED})) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang
        """,
        "parse_trees": """
            SELECT doc_id,
                   CAST(25 AS INTEGER) AS n_nodes,
                   CAST(3 AS INTEGER) AS n_attrs,
                   '' AS error
            FROM documents
        """,
        "token_count": f"""
            SELECT doc_id,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len({_TOKENS}) END AS BIGINT) AS n_tokens
            FROM documents
        """,
        "quality_score": f"""
            WITH toks AS (
                SELECT doc_id,
                       CAST(length(text) AS BIGINT) AS n_chars,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE {_TOKENS} END AS t
                FROM documents)
            SELECT doc_id, n_chars,
                   CAST(len(t) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(t)) AS BIGINT) AS n_unique_tokens,
                   CASE WHEN len(t) = 0 THEN 0.0
                        ELSE CAST({_stop_count(_EN_STOP)} AS DOUBLE) / len(t)
                   END AS stopword_ratio
            FROM toks
        """,
        "doc_fingerprint": """
            SELECT doc_id, md5(text) AS fp_md5 FROM documents
        """,
        "lang_id": f"""
            WITH scored AS (
                SELECT doc_id,
                       regexp_matches(text,
                         '[\\x{{3040}}-\\x{{30ff}}\\x{{4e00}}-\\x{{9fff}}]') AS cjk,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE string_split_regex(trim(lower(text)), '\\s+')
                       END AS t
                FROM documents),
            votes AS (
                SELECT doc_id, cjk,
                       {_stop_count(_DE_STOP)} AS s_de,
                       {_stop_count(_EN_STOP)} AS s_en,
                       {_stop_count(_ES_STOP)} AS s_es,
                       {_stop_count(_FR_STOP)} AS s_fr
                FROM scored)
            SELECT doc_id,
                   CASE WHEN cjk THEN 'zh'
                        WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                        WHEN s_de >= greatest(s_en, s_es, s_fr) THEN 'de'
                        WHEN s_en >= greatest(s_es, s_fr) THEN 'en'
                        WHEN s_es >= s_fr THEN 'es'
                        ELSE 'fr' END AS lang_pred
            FROM votes
        """,
        "lang_stats": """
            SELECT lang,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   AVG(n_chars) AS avg_chars
            FROM documents GROUP BY lang
        """,
        "top_sources": """
            SELECT source, COUNT(*) AS n_docs
            FROM documents GROUP BY source
            ORDER BY n_docs DESC, source ASC LIMIT 10
        """,
        "events_by_type": """
            SELECT event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT))
                        AS BIGINT) AS sum_value_micros
            FROM events GROUP BY event_type
        """,
        # Fixture corpus is a fixed constant (16 reference fixtures,
        # independent of sf); expected node counts are pinned by the
        # byte-identical reference goldens in tests/test_conformance.py.
        "parse_fixture_corpus": """
            SELECT * FROM (VALUES
                ('fixture://componentWIthSlots.tmph.html', CAST(9 AS INTEGER), ''),
                ('fixture://componentWithAsyncAttributes.tmph.html', 5, ''),
                ('fixture://componentWithProps.tmph.html', 5, ''),
                ('fixture://componentWithScripts.tmph.html', 17, ''),
                ('fixture://componentWithStyles.tmph.html', 18, ''),
                ('fixture://dynamicContentComponent.tmph.html', 5, ''),
                ('fixture://geyer.dev.tmph.html', 390, ''),
                ('fixture://incompleteElement.tmph.html', 2, ''),
                ('fixture://inlineSubComponents.tmph.html', 35, ''),
                ('fixture://layout.tmph.html', 17, ''),
                ('fixture://markdownComponent.tmph.html', 6, ''),
                ('fixture://simpleComponent.tmph.html', 23, ''),
                ('fixture://unicode.tmph.html', 7, ''),
                ('fixture://utf16-be.tmph.html', 3, ''),
                ('fixture://utf16-le.tmph.html', 3, ''),
                ('fixture://utf8-bom.tmph.html', 3, '')
            ) AS t(url, n_nodes, error)
        """,
        # Closed-form near-dup oracles: the engine's 64-bit-shingle-hash
        # Jaccard equals the exact string-shingle Jaccard (collision
        # odds ~1e-13/pair) and is emitted unrounded, so the same
        # integer division is bit-identical here. LSH recall is exactly
        # 1.0 on this workload (verified: the exhaustive pair set above
        # each threshold equals the banded candidate intersection).
        "dedup_minhash": _JACCARD_PAIRS_SQL.format(threshold=0.8),
        "ngram_jaccard_pairs": _JACCARD_PAIRS_SQL.format(threshold=0.5),
        # sub-document chunk dedup: first occurrence per distinct
        # 10-token window under (doc_id, idx) order; docs reassembled
        # from survivors, fully-duplicate docs dropped. The engine's
        # md5-low-64 fingerprint equals exact chunk-text equality here
        # (collision odds ~n^2/2^65).
        # outliers: the z-test as a cross-multiplied INT inequality over
        # exact centi-scaled values — no float mean/variance on either
        # side, so the flag set is bit-exact.
        "events_value_outliers": r"""
            WITH e AS (
                SELECT event_id, user_id,
                       CAST(round(value * 100) AS BIGINT) AS v, value
                FROM events),
            s AS (
                SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(v) AS BIGINT) AS sv,
                       CAST(SUM(v * v) AS BIGINT) AS sv2
                FROM e GROUP BY user_id)
            SELECT e.event_id, e.user_id, e.value
            FROM e JOIN s USING (user_id)
            WHERE (s.n * e.v - s.sv) * (s.n * e.v - s.sv)
                  > 4 * (s.n * s.sv2 - s.sv * s.sv)
            ORDER BY e.event_id
        """,
        # web composite: the synthetic corpus's extraction is a closed
        # form of the document row, so the whole HTML->sequences chain
        # (clone union -> extract -> token gate -> exact dedup ->
        # packing scan) is exactly SQL-expressible. Dedup partitions by
        # the extracted TEXT itself (the engine's md5 fp equals exact
        # text equality; collision odds ~n^2/2^129).
        "web_pipeline": r"""
            WITH base AS (
                SELECT doc_id,
                       'home ' || lang || source || ' #'
                       || CAST(doc_id AS VARCHAR) || text
                       || 'contact: mail' AS xt
                FROM documents),
            corpus AS (
                SELECT doc_id, xt FROM base
                UNION ALL
                SELECT doc_id + 700000, xt FROM base
                WHERE doc_id % 7 = 0),
            gated AS (
                SELECT doc_id, xt,
                       CAST(len(string_split_regex(trim(xt), '\s+'))
                            AS BIGINT) AS n_tokens
                FROM corpus
                WHERE len(string_split_regex(trim(xt), '\s+')) >= 16),
            dedup AS (
                SELECT doc_id, n_tokens FROM (
                    SELECT doc_id, n_tokens,
                           ROW_NUMBER() OVER (PARTITION BY xt
                                              ORDER BY doc_id) AS rn
                    FROM gated) WHERE rn = 1),
            packed AS (
                SELECT doc_id, n_tokens,
                       CAST(COALESCE(SUM(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS BIGINT) AS before
                FROM dedup)
            SELECT doc_id, n_tokens,
                   before // 64 AS chunk_id,
                   before % 64 AS chunk_offset
            FROM packed ORDER BY doc_id
        """,
        # PMI: the ratio is ONE float-division chain over exact int64
        # operands with the same associativity on both sides — bit-exact
        # (sums never enter a float).
        "pmi_bigrams": r"""
            WITH toks AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                FROM documents WHERE trim(text) <> ''),
            uni AS (SELECT unnest(t) AS w FROM toks),
            c1 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n
                   FROM uni GROUP BY w),
            nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu FROM uni),
            bi AS (
                SELECT unnest([t[i] || ' ' || t[i+1]
                               for i in range(1, len(t))]) AS bg
                FROM toks WHERE len(t) >= 2),
            c2 AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS n
                   FROM bi GROUP BY bg),
            nbt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM bi),
            sc AS (
                SELECT c2.bg AS bigram, c2.n AS n_pair,
                       ((CAST(c2.n AS DOUBLE) * nu.nu) * nu.nu)
                       / ((CAST(nbt.nb AS DOUBLE) * a.n) * b.n)
                           AS pmi_ratio
                FROM c2 CROSS JOIN nu CROSS JOIN nbt
                JOIN c1 a ON a.w = split_part(c2.bg, ' ', 1)
                JOIN c1 b ON b.w = split_part(c2.bg, ' ', 2)
                WHERE c2.n >= 5)
            SELECT bigram, n_pair, pmi_ratio FROM sc
            ORDER BY pmi_ratio DESC, bigram ASC LIMIT 20
        """,
        "inverted_index": r"""
            WITH tok AS (
                SELECT DISTINCT doc_id, token FROM (
                    SELECT doc_id,
                           unnest(string_split_regex(trim(text),
                                                     '\s+')) AS token
                    FROM documents WHERE trim(text) <> ''))
            SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
                   string_agg(CAST(doc_id AS VARCHAR), ','
                              ORDER BY doc_id) AS postings
            FROM tok GROUP BY token ORDER BY token
        """,
        # NB classifier: every quantity is exact int64 (fixed-point
        # floor-divided likelihoods, integer priors), so argmax equality
        # is bit-exact; ties break on the smaller class label on both
        # sides (ORDER BY score DESC, c ASC == numpy first-max over
        # ascending-sorted classes).
        "nb_lang_classify": r"""
            WITH d AS (
                SELECT doc_id, lang, trim(text) AS t
                FROM documents WHERE trim(text) <> ''),
            tok AS (
                SELECT doc_id,
                       unnest(string_split_regex(t, '\s+')) AS tok
                FROM d),
            ntc AS (
                SELECT dd.lang AS c, t.tok,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM tok t JOIN d dd USING (doc_id) GROUP BY 1, 2),
            nc AS (SELECT c, CAST(SUM(n) AS BIGINT) AS n_c
                   FROM ntc GROUP BY c),
            vv AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
                   FROM tok),
            dc AS (SELECT lang AS c, CAST(COUNT(*) AS BIGINT) AS d_c
                   FROM d GROUP BY 1),
            dtot AS (SELECT CAST(COUNT(*) AS BIGINT) AS d_tot FROM d),
            pri AS (
                SELECT c, (d_c * 1000000000) // d_tot AS prior,
                       n_c, v
                FROM dc JOIN nc USING (c) CROSS JOIN vv
                CROSS JOIN dtot),
            occ AS (
                SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS m
                FROM tok GROUP BY 1, 2),
            sc AS (
                SELECT o.doc_id, p.c,
                       SUM(o.m * (((COALESCE(x.n, 0) + 1)
                                   * 1000000000) // (p.n_c + p.v)))
                           AS s
                FROM occ o CROSS JOIN pri p
                LEFT JOIN ntc x ON x.c = p.c AND x.tok = o.tok
                GROUP BY 1, 2),
            tot AS (
                SELECT s.doc_id, s.c,
                       CAST(s.s + p.prior AS BIGINT) AS score
                FROM sc s JOIN pri p USING (c)),
            best AS (
                SELECT doc_id, c, score,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                           ORDER BY score DESC, c ASC) AS rn
                FROM tot)
            SELECT d.doc_id, d.lang, b.c AS pred_lang,
                   b.score AS pred_score
            FROM d JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
            ORDER BY d.doc_id
        """,
        "ngram_lm_ppl": r"""
            WITH toks AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                FROM documents WHERE trim(text) <> ''),
            c1 AS (
                SELECT w, CAST(COUNT(*) AS DOUBLE) AS n
                FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
            v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM c1),
            bi AS (
                SELECT doc_id, unnest([t[i] || ' ' || t[i+1]
                                       for i in range(1, len(t))]) AS bg
                FROM toks WHERE len(t) >= 2),
            c2 AS (
                SELECT bg, CAST(COUNT(*) AS DOUBLE) AS n
                FROM bi GROUP BY bg),
            terms AS (
                SELECT bi.doc_id,
                       ln((c2.n + 1.0) / (c1.n + v.v)) AS term
                FROM bi
                JOIN c2 USING (bg)
                JOIN c1 ON c1.w = split_part(bi.bg, ' ', 1)
                CROSS JOIN v)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   ROUND(EXP(-SUM(term) / COUNT(*)), 4) AS ppl
            FROM terms GROUP BY doc_id ORDER BY doc_id
        """,
        "domain_pagerank": r"""
            -- 5 power iterations of rank' = (1-d)/N + d*sum(rank*w/deg)
            -- over the deterministic domain graph
            WITH ew AS (
                SELECT doc_id % 20 AS src, (3*doc_id + 7) % 20 AS dst,
                       CAST(COUNT(*) AS DOUBLE) AS w
                FROM documents GROUP BY 1, 2),
            deg AS (SELECT src, SUM(w) AS deg FROM ew GROUP BY src),
            nodes AS (
                SELECT DISTINCT node FROM (
                    SELECT src AS node FROM ew
                    UNION ALL SELECT dst FROM ew)),
            nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
            r0 AS (SELECT node, 1.0 / nn.n AS rank
                   FROM nodes CROSS JOIN nn),
            r1 AS (SELECT nodes.node,
                          0.15 / nn.n + 0.85 * COALESCE(SUM(
                              r0.rank * ew.w / deg.deg), 0) AS rank
                   FROM nodes CROSS JOIN nn
                   LEFT JOIN ew ON ew.dst = nodes.node
                   LEFT JOIN deg ON deg.src = ew.src
                   LEFT JOIN r0 ON r0.node = ew.src
                   GROUP BY nodes.node, nn.n),
            r2 AS (SELECT nodes.node,
                          0.15 / nn.n + 0.85 * COALESCE(SUM(
                              r1.rank * ew.w / deg.deg), 0) AS rank
                   FROM nodes CROSS JOIN nn
                   LEFT JOIN ew ON ew.dst = nodes.node
                   LEFT JOIN deg ON deg.src = ew.src
                   LEFT JOIN r1 ON r1.node = ew.src
                   GROUP BY nodes.node, nn.n),
            r3 AS (SELECT nodes.node,
                          0.15 / nn.n + 0.85 * COALESCE(SUM(
                              r2.rank * ew.w / deg.deg), 0) AS rank
                   FROM nodes CROSS JOIN nn
                   LEFT JOIN ew ON ew.dst = nodes.node
                   LEFT JOIN deg ON deg.src = ew.src
                   LEFT JOIN r2 ON r2.node = ew.src
                   GROUP BY nodes.node, nn.n),
            r4 AS (SELECT nodes.node,
                          0.15 / nn.n + 0.85 * COALESCE(SUM(
                              r3.rank * ew.w / deg.deg), 0) AS rank
                   FROM nodes CROSS JOIN nn
                   LEFT JOIN ew ON ew.dst = nodes.node
                   LEFT JOIN deg ON deg.src = ew.src
                   LEFT JOIN r3 ON r3.node = ew.src
                   GROUP BY nodes.node, nn.n),
            r5 AS (SELECT nodes.node,
                          0.15 / nn.n + 0.85 * COALESCE(SUM(
                              r4.rank * ew.w / deg.deg), 0) AS rank
                   FROM nodes CROSS JOIN nn
                   LEFT JOIN ew ON ew.dst = nodes.node
                   LEFT JOIN deg ON deg.src = ew.src
                   LEFT JOIN r4 ON r4.node = ew.src
                   GROUP BY nodes.node, nn.n)
            SELECT node, ROUND(rank, 6) AS rank
            FROM r5 ORDER BY node
        """,
        "events_running_total": r"""
            SELECT event_id, user_id, ts,
                   CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT))
                        OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS running_micros
            FROM events ORDER BY event_id
        """,
        "extract_links": r"""
            -- the synthetic page template carries exactly these three
            -- links per document (sources/synthetic.py:page_html)
            SELECT doc_id, CAST(0 AS BIGINT) AS link_idx,
                   '/' AS href, 'home' AS anchor
            FROM documents
            UNION ALL
            SELECT doc_id, CAST(1 AS BIGINT), '/l/' || lang, lang
            FROM documents
            UNION ALL
            SELECT doc_id, CAST(2 AS BIGINT), 'mailto:x@example.com',
                   'mail'
            FROM documents
            ORDER BY doc_id, link_idx
        """,
        "dsir_weights": r"""
            -- DSIR hashed-unigram importance weight vs the lang='en'
            -- target slice; add-one smoothing over 1024 md5 buckets
            WITH tok AS (
                SELECT doc_id,
                       CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_t,
                       CAST(CAST(('0x' || substr(md5(w), 1, 8))
                                 AS UBIGINT) % 1024 AS BIGINT) AS b
                FROM (SELECT doc_id, lang,
                             unnest(string_split_regex(trim(text),
                                                       '\s+')) AS w
                      FROM documents WHERE trim(text) <> '')),
            tot AS (
                SELECT CAST(COUNT(*) AS DOUBLE) AS n_raw_total,
                       CAST(SUM(is_t) AS DOUBLE) AS n_tgt_total
                FROM tok),
            hist AS (
                SELECT b, CAST(COUNT(*) AS DOUBLE) AS n_raw,
                       CAST(SUM(is_t) AS DOUBLE) AS n_tgt
                FROM tok GROUP BY b),
            lr AS (
                SELECT b,
                       ln((n_tgt + 1.0) / (tot.n_tgt_total + 1024))
                     - ln((n_raw + 1.0) / (tot.n_raw_total + 1024))
                           AS term
                FROM hist CROSS JOIN tot),
            s AS (
                SELECT tok.doc_id, SUM(lr.term) AS logw
                FROM tok JOIN lr USING (b) GROUP BY tok.doc_id)
            SELECT d.doc_id,
                   ROUND(COALESCE(s.logw, 0), 4) AS dsir_logw
            FROM documents d LEFT JOIN s USING (doc_id)
            ORDER BY d.doc_id
        """,
        "url_parse": r"""
            -- ground-truth rebuild of every parsed field from the
            -- generating row (sources/synthetic.py:crawl_url)
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'http'
                        ELSE 'https' END AS scheme,
                   (CASE doc_id % 4 WHEN 0 THEN 'www.'
                                    WHEN 1 THEN 'blog.'
                                    WHEN 2 THEN ''
                                    ELSE 'news.' END)
                   || source || '-site.'
                   || (CASE doc_id % 5 WHEN 0 THEN 'com'
                                       WHEN 1 THEN 'org'
                                       WHEN 2 THEN 'net'
                                       WHEN 3 THEN 'co.uk'
                                       ELSE 'com.cn' END) AS host,
                   source || '-site.'
                   || (CASE doc_id % 5 WHEN 0 THEN 'com'
                                       WHEN 1 THEN 'org'
                                       WHEN 2 THEN 'net'
                                       WHEN 3 THEN 'co.uk'
                                       ELSE 'com.cn' END)
                       AS registered_domain,
                   CAST(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END
                        AS BIGINT) AS has_port,
                   CAST(CASE WHEN doc_id % 6 = 0 THEN 2 ELSE 3 END
                        AS BIGINT) AS path_depth,
                   CAST(doc_id % 3 AS BIGINT) AS n_query_params
            FROM documents ORDER BY doc_id
        """,
        "url_host_stats": r"""
            WITH parsed AS (
                SELECT source || '-site.'
                       || (CASE doc_id % 5 WHEN 0 THEN 'com'
                                           WHEN 1 THEN 'org'
                                           WHEN 2 THEN 'net'
                                           WHEN 3 THEN 'co.uk'
                                           ELSE 'com.cn' END)
                           AS registered_domain,
                       CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END
                           AS is_https,
                       CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END
                           AS has_port,
                       CASE WHEN doc_id % 6 = 0 THEN 2 ELSE 3 END
                           AS path_depth,
                       doc_id % 3 AS n_query_params
                FROM documents)
            SELECT registered_domain,
                   COUNT(*) AS n_pages,
                   CAST(SUM(is_https) AS BIGINT) AS n_https,
                   CAST(SUM(has_port) AS BIGINT) AS n_with_port,
                   AVG(path_depth) AS avg_path_depth,
                   CAST(SUM(n_query_params) AS BIGINT) AS n_params
            FROM parsed GROUP BY registered_domain
            ORDER BY registered_domain
        """,
        "extract_text_pdf": r"""
            -- closed form of the PDF layout contract: 8 tokens/line,
            -- 6 lines/page, split lines ((g-1)%4==1, full) count 2 runs
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = ''
                            THEN CAST([] AS VARCHAR[])
                            ELSE string_split_regex(trim(text), '\s+')
                       END AS t
                FROM documents),
            lns AS (
                SELECT doc_id, t,
                       CAST(CEIL(len(t) / 8.0) AS BIGINT) AS n_lines
                FROM toks)
            SELECT doc_id,
                   array_to_string(
                       [array_to_string(t[(8*g-7):(8*g)], ' ')
                        for g in range(1, n_lines + 1)],
                       chr(10)) AS pdf_text,
                   GREATEST(1, CAST(CEIL(n_lines / 6.0) AS BIGINT))
                       AS n_pages,
                   n_lines + len([g for g in range(1, n_lines + 1)
                                  if (g - 1) % 4 = 1
                                  AND 8 * g <= len(t)]) AS n_chunks,
                   '' AS error
            FROM lns ORDER BY doc_id
        """,
        "ppl_buckets": r"""
            WITH toks AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                FROM documents WHERE trim(text) <> ''),
            c1 AS (
                SELECT w, CAST(COUNT(*) AS DOUBLE) AS n
                FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
            v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM c1),
            bi AS (
                SELECT doc_id, unnest([t[i] || ' ' || t[i+1]
                                       for i in range(1, len(t))]) AS bg
                FROM toks WHERE len(t) >= 2),
            c2 AS (
                SELECT bg, CAST(COUNT(*) AS DOUBLE) AS n
                FROM bi GROUP BY bg),
            terms AS (
                SELECT bi.doc_id,
                       ln((c2.n + 1.0) / (c1.n + v.v)) AS term
                FROM bi
                JOIN c2 USING (bg)
                JOIN c1 ON c1.w = split_part(bi.bg, ' ', 1)
                CROSS JOIN v),
            scored AS (
                SELECT doc_id,
                       ROUND(EXP(-SUM(term) / COUNT(*)), 4) AS ppl
                FROM terms GROUP BY doc_id),
            thr AS (
                SELECT quantile_disc(ppl, 1.0/3) AS t1,
                       quantile_disc(ppl, 2.0/3) AS t2
                FROM scored)
            SELECT doc_id, ppl,
                   CASE WHEN ppl <= t1 THEN 'head'
                        WHEN ppl <= t2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM scored CROSS JOIN thr ORDER BY doc_id
        """,
        "semdedup": """
            -- End keep-set of the within-cluster greedy rule, expressed
            -- as the exhaustive global pairwise rule: on this workload
            -- the only pairs at cosine >= 0.95 are planted exact clones
            -- (identical vectors share a cluster by construction and
            -- their originals are never dropped, so greedy == any);
            -- the greedy/cluster semantics themselves are pinned by the
            -- pytest brute-force reference.
            WITH emb AS (
                SELECT vec_id, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 100000 AS vec_id, embedding
                FROM embeddings WHERE vec_id % 10 = 0)
            SELECT e.vec_id,
                   NOT EXISTS (
                       SELECT 1 FROM emb o
                       WHERE o.vec_id < e.vec_id
                         AND list_cosine_similarity(
                                 CAST(o.embedding AS DOUBLE[]),
                                 CAST(e.embedding AS DOUBLE[])) >= 0.95
                   ) AS keep
            FROM emb e
            ORDER BY vec_id
        """,
        "paragraph_dedup": """
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 100000 AS doc_id, text || ' extra' AS text
                FROM documents WHERE doc_id % 10 = 0
            ),
            t AS (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM corpus),
            c AS (
                SELECT doc_id, CAST(i AS BIGINT) AS idx,
                       array_to_string(toks[i*10+1 : i*10+10], ' ')
                           AS chunk
                FROM t, range(0, 4096) r(i)
                WHERE i * 10 < len(toks)
            ),
            k AS (
                SELECT doc_id, idx, chunk,
                       ROW_NUMBER() OVER (PARTITION BY chunk
                                          ORDER BY doc_id, idx) AS rn
                FROM c
            )
            SELECT doc_id,
                   string_agg(chunk, ' ' ORDER BY idx)
                       FILTER (rn = 1) AS text_clean,
                   COUNT(*) AS n_chunks,
                   COUNT(*) FILTER (rn = 1) AS n_kept
            FROM k GROUP BY doc_id
            HAVING COUNT(*) FILTER (rn = 1) > 0
        """,
        "dedup_exact": """
            SELECT doc_id, text, lang, source, n_chars
            FROM documents
            QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text)
                                       ORDER BY doc_id) = 1
        """,
        "knn_cosine": """
            WITH q AS (
                SELECT vec_id AS qid, embedding AS qe
                FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)),
            sims AS (
                SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) AS sim
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id != q.qid)
            SELECT query_id, neighbor_id,
                   CAST(ROW_NUMBER() OVER (
                        PARTITION BY query_id
                        ORDER BY sim DESC, neighbor_id ASC) AS BIGINT) AS rank,
                   ROUND(sim, 4) AS cosine_sim
            FROM sims
            QUALIFY rank <= 5
            ORDER BY query_id, rank
        """,
        # REAL-decode closed form: images cycle PNG/BMP/GIF/JPEG/VP8L
        # by doc_id%5 with pixel values as integer functions of
        # (doc_id, x, y, ch); top_bin is the argmax 16-bin histogram
        # bucket (value // 16), lowest bin on ties
        "multimodal_features": """
            WITH params AS (
                SELECT doc_id AS media_id,
                       4 + doc_id % 13 AS width,
                       3 + doc_id % 11 AS height,
                       doc_id % 5 AS fmt,
                       CASE WHEN doc_id % 5 = 3 THEN 1
                            WHEN doc_id % 5 = 4 THEN 4
                            WHEN doc_id % 5 = 0 THEN
                                 CASE (doc_id // 5) % 3 WHEN 0 THEN 1
                                      WHEN 1 THEN 3 ELSE 4 END
                            ELSE 3 END AS channels
                FROM documents),
            px AS (
                SELECT media_id,
                       (CASE WHEN fmt = 3
                             THEN ((x//8)*5 + (y//8)*9
                                   + media_id*3) % 256
                             ELSE (x*3 + y*7 + ch*11
                                   + media_id) % 256
                        END) // 16 AS bin
                FROM params, range(16) rx(x), range(13) ry(y),
                     range(4) rc(ch)
                WHERE x < width AND y < height AND ch < channels),
            bc AS (SELECT media_id, bin, COUNT(*) AS n
                   FROM px GROUP BY media_id, bin),
            top AS (SELECT media_id, bin, n,
                           ROW_NUMBER() OVER (
                               PARTITION BY media_id
                               ORDER BY n DESC, bin ASC) AS rn
                    FROM bc)
            SELECT p.media_id, CAST(p.width AS BIGINT) AS width,
                   CAST(p.height AS BIGINT) AS height,
                   CAST(p.channels AS BIGINT) AS channels,
                   CAST(t.bin AS BIGINT) AS top_bin,
                   CAST(t.n AS BIGINT) AS top_bin_count
            FROM params p
            JOIN top t ON p.media_id = t.media_id AND t.rn = 1
        """,
        # closed form of the real container-header decode: payloads
        # cycle PNG/GIF/JPEG/BMP/WebP-VP8X by doc_id%5 with
        # dims/channels as functions of doc_id (odd WebP ids carry the
        # alpha flag -> 4 channels)
        "image_header_dims": """
            SELECT doc_id AS media_id,
                   CAST(1 + doc_id % 640 AS INTEGER) AS width,
                   CAST(1 + (doc_id * 7) % 480 AS INTEGER) AS height,
                   CAST(CASE
                        WHEN doc_id % 5 = 0 THEN
                             CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3
                                  ELSE 4 END
                        WHEN doc_id % 5 = 4 THEN
                             CASE WHEN doc_id % 2 = 1 THEN 4 ELSE 3 END
                        ELSE 3 END AS INTEGER) AS channels,
                   CAST(CASE doc_id % 5 WHEN 0 THEN 33 WHEN 1 THEN 13
                        WHEN 2 THEN 12 WHEN 3 THEN 26
                        ELSE 30 END AS BIGINT) AS n_bytes
            FROM documents
        """,
        "frame_offsets": """
            SELECT doc_id AS media_id,
                   CAST(LEAST(CEIL(octet_length(encode(text)) / 64.0), 8)
                        AS BIGINT) AS n_frames,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
            FROM documents
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 1000000) AS BIGINT))
                        AS BIGINT) AS sum_base_micros,
                   CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                       * 1000000) AS BIGINT))
                        AS BIGINT) AS sum_disc_micros,
                   COUNT(*) AS n_rows
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "orders_by_nation": """
            SELECT n.n_name AS nation,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(ROUND(o.o_totalprice * 1000000) AS BIGINT))
                        AS BIGINT) AS total_micros
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "events_windowed": """
            SELECT event_type,
                   date_trunc('hour', ts) AS window_start,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT))
                        AS BIGINT) AS sum_value_micros
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        """,
        "orders_top10": """
            SELECT o_orderkey, o_totalprice, o_orderpriority
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "extract_main_text": f"""
            SELECT doc_id,
                   source || ' #' || CAST(doc_id AS VARCHAR) || text
                          || 'contact: ' AS main_text
            FROM documents
        """,
        "extract_multi_encoding": f"""
            SELECT doc_id,
                   CASE doc_id % 6 WHEN 0 THEN 'utf-8'
                        WHEN 1 THEN 'utf-8-bom'
                        WHEN 2 THEN 'utf-16le'
                        WHEN 3 THEN 'utf-16be'
                        WHEN 4 THEN 'utf-32le'
                        ELSE 'utf-32be' END AS encoding,
                   {_EXTRACTED} AS extracted_text,
                   CAST(length({_EXTRACTED}) AS BIGINT) AS n_chars_extracted,
                   '' AS error
            FROM documents
        """,
        "term_doc_freq": r"""
            WITH toks AS (
                SELECT DISTINCT doc_id,
                       unnest(string_split_regex(trim(text), '\s+')) AS token
                FROM documents WHERE trim(text) <> '')
            SELECT token, COUNT(*) AS df FROM toks GROUP BY token
            ORDER BY df DESC, token ASC LIMIT 20
        """,
        "orders_mktsegment": """
            SELECT c.c_mktsegment AS mktsegment,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(ROUND(o.o_totalprice * 1000000) AS BIGINT))
                        AS BIGINT) AS total_micros
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "top_doc_per_lang": """
            SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars
            FROM documents
            QUALIFY ROW_NUMBER() OVER (PARTITION BY lang
                                       ORDER BY n_chars DESC, doc_id) = 1
            ORDER BY lang
        """,
        "token_count_bpe": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS BIGINT)
                       AS n_bpe_tokens
            FROM documents
        """,
        "dedup_embedding": """
            WITH emb AS (
                SELECT vec_id, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 100000 AS vec_id, embedding
                FROM embeddings WHERE vec_id % 10 = 0)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 4) AS cosine_sim
            FROM emb a JOIN emb b ON a.vec_id < b.vec_id
            WHERE ROUND(list_cosine_similarity(
                      CAST(a.embedding AS DOUBLE[]),
                      CAST(b.embedding AS DOUBLE[])), 4) >= 0.8
            ORDER BY id_a, id_b
        """,
        "user_sessions": """
            WITH marked AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w
                                    > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            numbered AS (
                SELECT user_id, ts,
                       SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS sid
                FROM marked
            )
            SELECT user_id,
                   CAST(sid - 1 AS BIGINT) AS session_idx,
                   COUNT(*) AS n_events,
                   MIN(ts) AS start_ts,
                   MAX(ts) AS end_ts
            FROM numbered GROUP BY user_id, sid
            ORDER BY user_id, session_idx
        """,
        "sample_documents": """
            SELECT * FROM documents
            WHERE ((doc_id * 2654435761) % 4294967296) % 100 < 10
        """,
        # REAL WAV-PCM closed form: same sample law as audio_pcm_stats
        # framed into 64-sample windows (GROUP BY i // 64)
        "audio_features": """
            WITH params AS (
                SELECT doc_id AS media_id,
                       CAST(8000 + (doc_id % 4) * 4000 AS BIGINT)
                           AS sample_rate,
                       100 + doc_id % 157 AS n FROM documents),
            s AS (
                SELECT media_id, i // 64 AS w,
                       ABS((i*37 + media_id*11) % 4096 - 2048) AS a
                FROM params, range(257) r(i) WHERE i < n),
            wins AS (SELECT media_id, w, SUM(a) AS e
                     FROM s GROUP BY media_id, w)
            SELECT p.media_id, p.sample_rate,
                   CAST(p.n AS BIGINT) AS n_samples,
                   CAST(COUNT(*) AS BIGINT) AS n_windows,
                   CAST(SUM(wins.e) AS BIGINT) AS energy_sum,
                   CAST(MAX(wins.e) AS BIGINT) AS peak_window
            FROM params p JOIN wins USING (media_id)
            GROUP BY p.media_id, p.sample_rate, p.n
        """,
        # REAL resize closed form: same image law as image_pixel_stats
        # (doc_id%4 format cycle) resized 16x16 nearest-neighbor —
        # source index = (target_index * src_dim) // 16
        "media_resize": """
            WITH params AS (
                SELECT doc_id AS media_id,
                       4 + doc_id % 13 AS width,
                       3 + doc_id % 11 AS height,
                       doc_id % 4 AS fmt,
                       CASE WHEN doc_id % 4 = 0 THEN
                            CASE (doc_id // 4) % 3 WHEN 0 THEN 1
                                 WHEN 1 THEN 3 ELSE 4 END
                            WHEN doc_id % 4 = 3 THEN 1
                       ELSE 3 END AS channels
                FROM documents),
            rz AS (
                SELECT media_id,
                       SUM(CASE WHEN fmt = 3
                           THEN ((((x*width)//16)//8)*5
                                 + (((y*height)//16)//8)*9
                                 + media_id*3) % 256
                           ELSE (((x*width)//16)*3
                                 + (((y*height)//16))*7
                                 + ch*11 + media_id) % 256
                           END) AS resized_sum
                FROM params, range(16) rx(x), range(16) ry(y),
                     range(4) rc(ch)
                WHERE ch < channels
                GROUP BY media_id)
            SELECT p.media_id,
                   CAST(16 AS BIGINT) AS width,
                   CAST(16 AS BIGINT) AS height,
                   CAST(p.channels AS BIGINT) AS channels,
                   CAST(256 * p.channels AS BIGINT) AS n_bytes_out,
                   CAST(rz.resized_sum AS BIGINT) AS resized_sum
            FROM params p JOIN rz USING (media_id)
        """,
        "events_asof_join": """
            WITH p AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
            c AS (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'click'),
            j AS (
                SELECT p.event_id, p.user_id, p.ts,
                       c.event_id AS prior_event_id, c.ts AS prior_ts,
                       ROW_NUMBER() OVER (
                           PARTITION BY p.event_id
                           ORDER BY c.ts DESC NULLS LAST,
                                    c.event_id DESC) AS rn
                FROM p LEFT JOIN c
                  ON p.user_id = c.user_id AND c.ts <= p.ts
            )
            SELECT event_id, user_id, ts, prior_event_id, prior_ts
            FROM j WHERE rn = 1
        """,
        "events_range_join": """
            WITH p AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
            c AS (SELECT user_id, ts,
                         CAST(ROUND(value * 1000000) AS BIGINT) AS vm
                  FROM events WHERE event_type = 'click')
            SELECT p.event_id, p.user_id, p.ts,
                   CAST(COUNT(c.ts) AS BIGINT) AS n_right,
                   CAST(COALESCE(SUM(c.vm), 0) AS BIGINT)
                       AS sum_right_micros
            FROM p LEFT JOIN c
              ON p.user_id = c.user_id
             AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
            GROUP BY p.event_id, p.user_id, p.ts
        """,
        "events_sliding_3h": """
            WITH hourly AS (
                SELECT event_type, date_trunc('hour', ts) AS window_start,
                       COUNT(*) AS n,
                       SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS s
                FROM events GROUP BY 1, 2)
            SELECT event_type, window_start,
                   CAST(SUM(n) OVER w AS BIGINT) AS n_events_3h,
                   CAST(SUM(s) OVER w AS BIGINT) AS sum_value_micros_3h
            FROM hourly
            WINDOW w AS (PARTITION BY event_type ORDER BY window_start
                         RANGE BETWEEN INTERVAL 2 HOURS PRECEDING
                               AND CURRENT ROW)
        """,
        "doc_length_percentiles": """
            SELECT lang,
                   CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50,
                   CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p90,
                   CAST(quantile_disc(n_chars, 0.99) AS BIGINT) AS p99
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "customers_no_urgent_orders": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                    WHERE o_orderpriority = '1-URGENT')
            ORDER BY c_custkey
        """,
        "bigram_counts": r"""
            WITH toks AS (
                SELECT string_split_regex(trim(text), '\s+') AS t
                FROM documents WHERE trim(text) <> ''),
            b AS (
                SELECT unnest([t[i] || ' ' || t[i+1]
                               for i in range(1, len(t))]) AS bigram
                FROM toks WHERE len(t) >= 2)
            SELECT bigram, COUNT(*) AS n FROM b GROUP BY bigram
            ORDER BY n DESC, bigram ASC LIMIT 20
        """,
        "distinct_tokens_per_lang": r"""
            SELECT lang,
                   CAST(COUNT(DISTINCT token) AS BIGINT)
                       AS n_distinct_tokens
            FROM (SELECT lang,
                         unnest(string_split_regex(trim(text), '\s+'))
                             AS token
                  FROM documents WHERE trim(text) <> '')
            GROUP BY lang ORDER BY lang
        """,
        "top3_docs_per_lang": """
            SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(ROW_NUMBER() OVER (
                        PARTITION BY lang
                        ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
            FROM documents
            QUALIFY rank <= 3
            ORDER BY lang, rank
        """,
        "label_stats": """
            SELECT label, COUNT(*) AS n_vecs,
                   CAST(SUM(CAST(ROUND(CAST(embedding[1] AS DOUBLE)
                                       * 1000000) AS BIGINT)) AS BIGINT)
                       AS sum_e0_micros
            FROM embeddings GROUP BY label ORDER BY label
        """,
    }
    # alternate-source queries share the base oracles (same output contract)
    d["extract_text_jsonl"] = d["extract_text"]
    d["extract_text_ipc"] = d["extract_text"]
    d["corpus_summary"] = f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                        ELSE len({_TOKENS}) END) AS BIGINT)
                   AS n_tokens,
               CAST(SUM(length(text)) AS BIGINT) AS n_chars,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(COUNT(*) - COUNT(DISTINCT md5(COALESCE(text, '')))
                    AS BIGINT) AS n_duplicates
        FROM documents
    """
    d["doc_novelty"] = f"""
        -- first-occurrence distinct 5-grams under doc_id order
        WITH toks AS (
            SELECT doc_id, {_TOKENS} AS t FROM documents
            WHERE trim(text) <> ''),
        g AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(t, i, i + 4), ' ')
                       AS gram
            FROM (SELECT doc_id, t,
                         unnest(generate_series(1, len(t) - 4)) AS i
                  FROM toks)),
        f AS (SELECT gram, MIN(doc_id) AS doc_id FROM g GROUP BY gram),
        num AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_first
                FROM f GROUP BY doc_id),
        den AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_distinct
                FROM g GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(num.n_first, 0) AS BIGINT) AS n_first,
               CAST(COALESCE(den.n_distinct, 0) AS BIGINT)
                   AS n_distinct,
               CAST(CASE WHEN COALESCE(den.n_distinct, 0) = 0 THEN 0
                    ELSE 100 * COALESCE(num.n_first, 0)
                         // den.n_distinct END AS BIGINT)
                   AS novelty_pct
        FROM documents d LEFT JOIN num USING (doc_id)
                         LEFT JOIN den USING (doc_id)
        ORDER BY d.doc_id
    """
    d["source_dedup_rate"] = """
        WITH fp AS (SELECT source, md5(COALESCE(text, '')) AS f
                    FROM documents)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT f) AS BIGINT) AS n_distinct,
               CAST(100 * (COUNT(*) - COUNT(DISTINCT f))
                    // COUNT(*) AS BIGINT) AS dup_pct
        FROM fp GROUP BY source ORDER BY source
    """
    d["video_tracks"] = """
        -- handler sets cycle by doc_id%3: (vide), (vide,soun),
        -- (vide,soun,vide); duration_ms = 1000*d // 1000
        SELECT doc_id AS media_id,
               CAST(CASE doc_id % 3 WHEN 2 THEN 2 ELSE 1 END
                    AS BIGINT) AS n_video,
               CAST(CASE WHEN doc_id % 3 >= 1 THEN 1 ELSE 0 END
                    AS BIGINT) AS n_audio,
               CAST(1000 * (doc_id * 31 + 7) // 1000 AS BIGINT)
                   AS duration_ms
        FROM documents ORDER BY doc_id
    """
    d["vocab_coverage"] = f"""
        -- rank words by (count DESC, word ASC); exact integer ppm
        WITH wf AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT unnest({_TOKENS}) AS w FROM documents
                  WHERE trim(text) <> '') GROUP BY w),
        t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM wf),
        r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, w ASC)
                  AS rk FROM wf)
        SELECT k.k, CAST(SUM(CASE WHEN r.rk <= k.k THEN r.n
                                  ELSE 0 END) AS BIGINT) AS covered,
               ANY_VALUE(t.total) AS total_tokens,
               CAST(SUM(CASE WHEN r.rk <= k.k THEN r.n ELSE 0 END)
                    * 1000000 // ANY_VALUE(t.total) AS BIGINT)
                   AS coverage_ppm
        FROM (VALUES (CAST(10 AS BIGINT)), (CAST(100 AS BIGINT)),
                     (CAST(1000 AS BIGINT))) k(k), r, t
        GROUP BY k.k ORDER BY k.k
    """
    d["image_pixel_stats_webp"] = """
        -- VP8L is lossless: same closed form as the PNG-RGBA case
        WITH params AS (
            SELECT doc_id AS media_id,
                   4 + doc_id % 13 AS width,
                   3 + doc_id % 11 AS height
            FROM documents),
        px AS (
            SELECT media_id,
                   SUM((x*3 + y*7 + ch*11 + media_id) % 256)
                       AS pixel_sum
            FROM params, range(16) rx(x), range(13) ry(y),
                 range(4) rc(ch)
            WHERE x < width AND y < height
            GROUP BY media_id),
        rz AS (
            SELECT media_id,
                   SUM((((x*width)//8)*3 + ((y*height)//8)*7
                        + ch*11 + media_id) % 256) AS resized_sum
            FROM params, range(8) rx(x), range(8) ry(y), range(4) rc(ch)
            GROUP BY media_id)
        SELECT p.media_id, CAST(p.width AS BIGINT) AS width,
               CAST(p.height AS BIGINT) AS height,
               CAST(px.pixel_sum AS BIGINT) AS pixel_sum,
               CAST(rz.resized_sum AS BIGINT) AS resized_sum
        FROM params p JOIN px USING (media_id) JOIN rz USING (media_id)
    """
    d["image_pixel_stats_vp8"] = """
        -- per-16x16-MB-constant YCbCr planes; VP8's DC-only residual
        -- solve is exact at qi=0, chroma subsampling is invisible on
        -- 16-aligned-constant planes, and the fixed-point BT.601
        -- integer conversion below is character-for-character the
        -- engine's _ycbcr_to_rgb (nonneg numerators: floor == trunc)
        WITH params AS (
            SELECT doc_id AS media_id,
                   8 + doc_id % 41 AS width,
                   6 + doc_id % 37 AS height
            FROM documents),
        pix AS (
            SELECT media_id, width, height, x, y,
                   (5*(x//16) + 9*(y//16) + 3*media_id) % 256 AS yy,
                   (7*(x//16) + 11*(y//16) + media_id) % 256 AS cb,
                   (13*(x//16) + 17*(y//16) + 5*media_id) % 256 AS cr
            FROM params, range(48) rx(x), range(42) ry(y)
            WHERE x < width AND y < height),
        rgb AS (
            SELECT media_id,
                   GREATEST(0, LEAST(255,
                       (1000000*yy + 1402000*(cr-128) + 256500000)
                           // 1000000 - 256))
                 + GREATEST(0, LEAST(255,
                       (1000000*yy - 344136*(cb-128) - 714136*(cr-128)
                        + 256500000) // 1000000 - 256))
                 + GREATEST(0, LEAST(255,
                       (1000000*yy + 1772000*(cb-128) + 256500000)
                           // 1000000 - 256)) AS s
            FROM pix),
        px AS (SELECT media_id, SUM(s) AS pixel_sum FROM rgb
               GROUP BY media_id),
        rpix AS (
            SELECT media_id,
                   (5*(((x*width)//8)//16) + 9*(((y*height)//8)//16)
                    + 3*media_id) % 256 AS yy,
                   (7*(((x*width)//8)//16) + 11*(((y*height)//8)//16)
                    + media_id) % 256 AS cb,
                   (13*(((x*width)//8)//16) + 17*(((y*height)//8)//16)
                    + 5*media_id) % 256 AS cr
            FROM params, range(8) rx(x), range(8) ry(y)),
        rrgb AS (
            SELECT media_id,
                   GREATEST(0, LEAST(255,
                       (1000000*yy + 1402000*(cr-128) + 256500000)
                           // 1000000 - 256))
                 + GREATEST(0, LEAST(255,
                       (1000000*yy - 344136*(cb-128) - 714136*(cr-128)
                        + 256500000) // 1000000 - 256))
                 + GREATEST(0, LEAST(255,
                       (1000000*yy + 1772000*(cb-128) + 256500000)
                           // 1000000 - 256)) AS s
            FROM rpix),
        rz AS (SELECT media_id, SUM(s) AS resized_sum FROM rrgb
               GROUP BY media_id)
        SELECT p.media_id, CAST(p.width AS BIGINT) AS width,
               CAST(p.height AS BIGINT) AS height,
               CAST(px.pixel_sum AS BIGINT) AS pixel_sum,
               CAST(rz.resized_sum AS BIGINT) AS resized_sum
        FROM params p JOIN px USING (media_id) JOIN rz USING (media_id)
    """
    d["orders_cube"] = """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)
                        * 10000) AS BIGINT) AS sum_price_micros
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY status, priority
    """
    d["doc_length_mad"] = f"""
        WITH t AS (SELECT lang,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len({_TOKENS}) END AS BIGINT) AS n
                   FROM documents),
        m AS (SELECT lang, CAST(quantile_disc(n, 0.5) AS BIGINT)
                  AS med FROM t GROUP BY lang)
        SELECT t.lang, ANY_VALUE(m.med) AS med,
               CAST(quantile_disc(abs(t.n - m.med), 0.5) AS BIGINT)
                   AS mad
        FROM t JOIN m USING (lang) GROUP BY t.lang ORDER BY t.lang
    """
    d["fold_text"] = """
        -- the injected accented prefix folds to the closed-form
        -- literal (the em dash has no decomposition and survives);
        -- the ascii document text just lowercases (it is already
        -- lowercase in the corpus generator)
        SELECT doc_id, 'coke \u2014 aei: ' || lower(text) AS folded
        FROM documents ORDER BY doc_id
    """
    d["crawl_schedule"] = (
        "WITH r AS (" + d["robots_filter"] + "), "
        "h AS (SELECT doc_id, "
        "(CASE doc_id % 4 WHEN 0 THEN 'www.' WHEN 1 THEN 'blog.' "
        " WHEN 2 THEN '' ELSE 'news.' END) || source || '-site.' || "
        "(CASE doc_id % 5 WHEN 0 THEN 'com' WHEN 1 THEN 'org' "
        " WHEN 2 THEN 'net' WHEN 3 THEN 'co.uk' ELSE 'com.cn' END) "
        "AS host FROM documents) "
        "SELECT r.doc_id, h.host, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY h.host "
        "     ORDER BY r.doc_id) - 1 AS BIGINT) AS slot "
        "FROM r JOIN h USING (doc_id) WHERE r.allowed "
        "ORDER BY r.doc_id")
    d["lang_confusion"] = (
        "WITH p AS (" + d["nb_lang_classify"] + ") "
        "SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM p GROUP BY 1, 2 ORDER BY 1, 2")
    d["extract_text_warc"] = d["extract_text"]
    d["token_count_csv"] = d["token_count"]
    d["user_sessions_salted"] = d["user_sessions"]
    d["extract_error_contract"] = """
        SELECT 'ff_insert' AS corruption, COUNT(*) AS n_docs,
               COUNT(*) AS n_errors, CAST(0 AS BIGINT) AS n_docs_with_text
        FROM documents WHERE doc_id % 3 = 1
        UNION ALL
        SELECT 'nul_insert', COUNT(*), CAST(0 AS BIGINT),
               CAST(0 AS BIGINT)
        FROM documents WHERE doc_id % 3 = 2
        UNION ALL
        SELECT 'ok', COUNT(*), CAST(0 AS BIGINT), COUNT(*)
        FROM documents WHERE doc_id % 3 = 0
        ORDER BY corruption
    """
    d["events_json_props"] = """
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(props::JSON->>'k' AS BIGINT)) AS BIGINT)
                   AS sum_k
        FROM events GROUP BY event_type ORDER BY event_type
    """
    d["normalize_text"] = (
        "SELECT doc_id, "
        "trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) "
        "AS norm_text, "
        "CAST(length(trim(regexp_replace(lower(text), '\\s+', ' ', "
        "'g'))) AS BIGINT) AS n_chars_norm FROM documents"
    )
    d["heavy_hitters"] = r"""
        WITH toks AS (
            SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
            FROM documents WHERE trim(text) <> ''),
        tot AS (SELECT COUNT(*) AS c FROM toks)
        SELECT token, COUNT(*) AS n FROM toks GROUP BY token
        HAVING COUNT(*) >= GREATEST((SELECT c FROM tot) // 200, 1)
        ORDER BY n DESC, token ASC
    """
    d["revenue_by_region"] = """
        SELECT r.r_name AS region,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                   * 1000000) AS BIGINT)) AS BIGINT)
                   AS revenue_micros
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY region
    """
    d["parts_by_brand"] = """
        SELECT p_brand AS brand, COUNT(*) AS n_parts,
               CAST(SUM(CAST(ROUND(p_retailprice * 1000000) AS BIGINT))
                    AS BIGINT) AS sum_price_micros,
               CAST(MIN(p_size) AS BIGINT) AS min_size,
               CAST(MAX(p_size) AS BIGINT) AS max_size
        FROM part GROUP BY p_brand ORDER BY brand
    """
    # Bit-exact SQL reproduction of the HyperLogLog estimate: register
    # indices/ranks from md5 (same little-endian uint64), sum(2^-reg)
    # carried as an exact scaled HUGEINT (order-free), identical
    # float-literal estimator + half-up rounding on both sides.
    d["approx_distinct_tokens_hll"] = r"""
        WITH toks AS (
            SELECT DISTINCT lang,
                   unnest(string_split_regex(trim(text), '\s+')) AS tok
            FROM documents WHERE trim(text) <> ''),
        h AS (
            SELECT lang,
                   CAST((SELECT SUM(CAST(('0x' || substr(md5(tok),
                                          2*i-1, 2)) AS UBIGINT)
                                    * CAST(POWER(256, i-1) AS UBIGINT))
                         FROM range(1, 9) r(i)) AS UBIGINT) AS hv
            FROM toks),
        regs AS (
            SELECT lang, hv >> CAST(52 AS UBIGINT) AS idx,
                   MAX(CAST(CASE WHEN (hv & ((CAST(1 AS UBIGINT)
                                 << CAST(52 AS UBIGINT))
                                 - CAST(1 AS UBIGINT))) = 0 THEN 53
                            ELSE 52 - length(bin(hv
                                 & ((CAST(1 AS UBIGINT)
                                     << CAST(52 AS UBIGINT))
                                     - CAST(1 AS UBIGINT)))) + 1
                            END AS BIGINT)) AS rank
            FROM h GROUP BY lang, idx),
        stats AS (
            SELECT lang,
                   SUM(CAST(POWER(2, 53 - rank) AS HUGEINT))
                       AS s_present,
                   COUNT(*) AS n_present
            FROM regs GROUP BY lang),
        est AS (
            SELECT lang,
                   s_present + CAST(4096 - n_present AS HUGEINT)
                               * CAST(POWER(2, 53) AS HUGEINT)
                       AS s_total,
                   4096 - n_present AS zeros
            FROM stats),
        raw AS (
            SELECT lang, zeros,
                   0.7213 / (1.0 + 1.079 / 4096.0) * 4096 * 4096
                       * 9007199254740992.0 / CAST(s_total AS DOUBLE)
                       AS e
            FROM est)
        SELECT lang,
               CAST(FLOOR(CASE WHEN e <= 2.5 * 4096 AND zeros > 0
                               THEN 4096 * ln(4096.0 / zeros)
                               ELSE e END + 0.5) AS BIGINT)
                   AS n_distinct_est
        FROM raw ORDER BY lang
    """
    d["keyword_search"] = r"""
        WITH scored AS (
            SELECT doc_id,
                   len(list_filter(string_split_regex(trim(text), '\s+'),
                       x -> list_contains(['the','data','with','time'], x)))
                       AS score
            FROM documents WHERE trim(text) <> '')
        SELECT doc_id, CAST(score AS BIGINT) AS score FROM scored
        WHERE score > 0 ORDER BY score DESC, doc_id ASC LIMIT 20
    """
    d["orders_rollup"] = """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 1000000) AS BIGINT))
                    AS BIGINT) AS total_micros
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        ORDER BY status, priority
    """
    d["doc_freq_score"] = r"""
        WITH tf AS (
            SELECT token, COUNT(*) AS n FROM (
                SELECT unnest(string_split_regex(trim(text), '\s+'))
                       AS token
                FROM documents WHERE trim(text) <> '')
            GROUP BY token),
        doc_toks AS (
            SELECT doc_id,
                   unnest(CASE WHEN trim(text) = ''
                               THEN CAST([] AS VARCHAR[])
                               ELSE string_split_regex(trim(text), '\s+')
                          END) AS token
            FROM documents)
        SELECT d.doc_id,
               CAST(COALESCE(SUM(tf.n), 0) AS BIGINT) AS freq_score
        FROM documents d
        LEFT JOIN doc_toks dt ON dt.doc_id = d.doc_id
        LEFT JOIN tf ON tf.token = dt.token
        GROUP BY d.doc_id
    """
    d["extract_spans"] = f"""
        SELECT doc_id,
               CAST(CASE WHEN text = '' THEN 6 ELSE 7 END AS BIGINT)
                   AS n_spans,
               TRUE AS spans_contiguous,
               CAST(length({_EXTRACTED}) AS BIGINT) AS total_span_chars
        FROM documents
    """
    # end-to-end near-dup removal: connected components over the exact
    # >=0.8 Jaccard pair graph (recursive min-label closure), keep each
    # component's min id
    d["dedup_minhash_keep"] = r"""
        WITH RECURSIVE corpus AS (
            SELECT doc_id, text, lang, source, n_chars FROM documents
            UNION ALL
            SELECT doc_id + 100000 AS doc_id, text || ' extra' AS text,
                   lang, source, n_chars + 6 AS n_chars
            FROM documents WHERE doc_id % 10 = 0
        ),
        norm AS (
            SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS t
            FROM corpus
        ),
        sh AS (
            SELECT doc_id,
                   CASE WHEN length(t) = 0 THEN CAST([] AS VARCHAR[])
                        WHEN length(t) < 5 THEN [t]
                        ELSE list_distinct([substring(t, CAST(x AS INT), 5)
                                            for x in range(1, length(t) - 3)])
                   END AS s
            FROM norm
        ),
        cand AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE least(len(a.s), len(b.s))
                  >= 0.8 * greatest(len(a.s), len(b.s))
        ),
        pairs AS (
            SELECT id_a, id_b FROM cand
            WHERE CASE WHEN len(sa) + len(sb) = 0 THEN 1.0
                       ELSE CAST(len(list_intersect(sa, sb)) AS DOUBLE)
                            / (len(sa) + len(sb)
                               - len(list_intersect(sa, sb)))
                  END >= 0.8
        ),
        edges AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs
        ),
        reach(id, r) AS (
            SELECT doc_id, doc_id FROM corpus
            UNION
            SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.id
        ),
        comp AS (SELECT id, MIN(r) AS root FROM reach GROUP BY id)
        SELECT c.doc_id, c.lang, c.source, CAST(c.n_chars AS BIGINT) AS n_chars
        FROM corpus c JOIN comp ON comp.id = c.doc_id
        WHERE comp.root = c.doc_id
        ORDER BY c.doc_id
    """
    # curation funnel: cumulative survivor counts per filter stage
    _funnel_base = rf"""
        WITH t AS (
            SELECT md5(text) AS fp,
                   CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                        ELSE {_TOKENS} END AS tk,
                   CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                        ELSE string_split_regex(trim(lower(text)), '\s+')
                   END AS lt,
                   regexp_matches(text,
                     '[\x{{3040}}-\x{{30ff}}\x{{4e00}}-\x{{9fff}}]') AS cjk
            FROM documents),
        feats AS (
            SELECT fp, len(tk) AS nt,
                   CASE WHEN len(tk) = 0 THEN 0.0
                        ELSE CAST({_stop_count(_EN_STOP, 'tk')} AS DOUBLE)
                             / len(tk) END AS sr,
                   CASE WHEN cjk THEN TRUE
                        ELSE greatest({_stop_count(_DE_STOP, 'lt')},
                                      {_stop_count(_EN_STOP, 'lt')},
                                      {_stop_count(_ES_STOP, 'lt')},
                                      {_stop_count(_FR_STOP, 'lt')}) > 0
                   END AS known
            FROM t)
    """
    d["corpus_filter_funnel"] = _funnel_base + """
        SELECT '0_input' AS stage, COUNT(*) AS n_docs FROM feats
        UNION ALL
        SELECT '1_min_tokens', COUNT(*) FROM feats WHERE nt >= 24
        UNION ALL
        SELECT '2_stopwords', COUNT(*) FROM feats
        WHERE nt >= 24 AND sr >= 0.02
        UNION ALL
        SELECT '3_lang_known', COUNT(*) FROM feats
        WHERE nt >= 24 AND sr >= 0.02 AND known
        UNION ALL
        SELECT '4_exact_dedup', COUNT(DISTINCT fp) FROM feats
        WHERE nt >= 24 AND sr >= 0.02 AND known
        ORDER BY stage
    """
    _toks_or_empty = (r"CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) "
                      rf"ELSE {_TOKENS} END")
    d["sequence_packing"] = f"""
        WITH t AS (
            SELECT doc_id,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len({_TOKENS}) END AS BIGINT) AS n_tokens
            FROM documents),
        c AS (
            SELECT doc_id, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS before
            FROM t)
        SELECT doc_id, n_tokens,
               CAST(before // 2048 AS BIGINT) AS chunk_id,
               CAST(before % 2048 AS BIGINT) AS chunk_offset
        FROM c
    """
    d["decontaminate"] = f"""
        WITH toks AS (
            SELECT doc_id, {_toks_or_empty} AS t FROM documents),
        g AS (
            SELECT doc_id,
                   array_to_string(list_slice(t, i, i + 7), ' ') AS gram
            FROM (SELECT doc_id, t,
                         unnest(generate_series(1, len(t) - 7)) AS i
                  FROM toks)),
        bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
        hit AS (
            SELECT DISTINCT doc_id FROM g
            WHERE doc_id % 97 <> 0
              AND gram IN (SELECT gram FROM bench))
        SELECT d.doc_id,
               CAST(CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END
                    AS BIGINT) AS contaminated
        FROM documents d LEFT JOIN hit h USING (doc_id)
        WHERE d.doc_id % 97 <> 0
    """
    _email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    _phone_re = r"\b\d{3}-\d{4}\b"
    d["pii_redact"] = f"""
        WITH aug AS (
            SELECT doc_id,
                   text ||
                   CASE WHEN doc_id % 7 = 0 THEN ' contact u' ||
                        CAST(doc_id AS VARCHAR) || '@example.com now'
                        ELSE '' END ||
                   CASE WHEN doc_id % 11 = 0 THEN ' call 555-0142'
                        ELSE '' END AS t
            FROM documents),
        m AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(t, '{_email_re}'))
                        AS BIGINT) AS n_emails,
                   regexp_replace(t, '{_email_re}', '<EMAIL>', 'g') AS t2
            FROM aug)
        SELECT doc_id,
               regexp_replace(t2, '{_phone_re}', '<PHONE>', 'g')
                   AS clean_text,
               n_emails,
               CAST(len(regexp_extract_all(t2, '{_phone_re}'))
                    AS BIGINT) AS n_phones
        FROM m
    """
    d["repetition_ratio"] = f"""
        WITH toks AS (
            SELECT doc_id, {_toks_or_empty} AS t FROM documents),
        g AS (
            SELECT doc_id,
                   array_to_string(list_slice(t, i, i + 2), ' ') AS gram
            FROM (SELECT doc_id, t,
                         unnest(generate_series(1, len(t) - 2)) AS i
                  FROM toks)),
        a AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
                   CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct
            FROM g GROUP BY doc_id),
        f AS (
            SELECT d.doc_id,
                   COALESCE(a.n_grams, 0) AS n_grams,
                   COALESCE(a.n_distinct, 0) AS n_distinct
            FROM documents d LEFT JOIN a USING (doc_id))
        SELECT doc_id, n_grams, n_distinct,
               CAST(CASE WHEN n_grams > 0
                    THEN (100 * (n_grams - n_distinct)) // n_grams
                    ELSE 0 END AS BIGINT) AS dup_pct,
               CAST(CASE WHEN n_grams > 0 AND
                         (100 * (n_grams - n_distinct)) // n_grams >= 20
                    THEN 1 ELSE 0 END AS BIGINT) AS is_repetitive
        FROM f
    """
    d["stratified_sample_by_lang"] = """
        SELECT lang, doc_id,
               CAST(row_number() OVER w AS BIGINT) AS "rank"
        FROM documents
        WINDOW w AS (PARTITION BY lang
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
        QUALIFY row_number() OVER w <= 5
        ORDER BY lang, "rank"
    """
    d["source_mixture_sample"] = """
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled
        FROM documents
        WHERE ((doc_id * 2654435761) % 4294967296) % 100
              < 5 + (CAST(SUBSTR(source, 4, 99) AS BIGINT) % 4) * 10
        GROUP BY source ORDER BY source
    """
    d["events_lag"] = """
        SELECT event_id, user_id, ts,
               LAG(event_id) OVER w AS prev_event_id,
               LAG(ts) OVER w AS prev_ts,
               CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS BIGINT)
                   AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """
    d["incremental_dedup"] = """
        WITH snap AS (
            SELECT DISTINCT md5(text) AS fp FROM documents
            WHERE doc_id % 3 = 0),
        inc AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
            UNION ALL
            SELECT doc_id + 500000 AS doc_id, text FROM documents
            WHERE doc_id % 6 = 0)
        SELECT i.doc_id,
               CAST(CASE WHEN s.fp IS NULL THEN 0 ELSE 1 END AS BIGINT)
                   AS is_dup
        FROM inc i LEFT JOIN snap s ON md5(i.text) = s.fp
        ORDER BY i.doc_id
    """
    d["quality_classifier"] = rf"""
        WITH tok AS (
            SELECT doc_id, unnest({_TOKENS}) AS tok
            FROM documents WHERE trim(text) <> ''),
        s AS (
            SELECT doc_id,
                   SUM(CAST(CAST(('0x' || substr(md5(tok), 1, 8))
                                 AS UBIGINT) % 21 AS BIGINT) - 10)
                       AS score
            FROM tok GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(s.score, 0) AS BIGINT) AS score,
               CAST(CASE WHEN COALESCE(s.score, 0) >= 0
                    THEN 1 ELSE 0 END AS BIGINT) AS is_quality
        FROM documents d LEFT JOIN s USING (doc_id)
    """
    d["tfidf_search"] = rf"""
        WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        tok AS (
            SELECT doc_id, unnest({_TOKENS}) AS tok
            FROM documents WHERE trim(text) <> ''),
        df AS (
            SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tok
            WHERE tok IN ('join', 'hash', 'vector') GROUP BY tok),
        tf AS (
            SELECT doc_id, tok, COUNT(*) AS tf FROM tok
            WHERE tok IN ('join', 'hash', 'vector')
            GROUP BY doc_id, tok),
        sc AS (
            SELECT t.doc_id,
                   SUM(t.tf * (1000000 * (SELECT n FROM nn)
                               // (1 + d.df))) AS score_milli
            FROM tf t JOIN df d USING (tok) GROUP BY t.doc_id)
        SELECT doc_id, CAST(score_milli AS BIGINT) AS score_milli,
               CAST(ROW_NUMBER() OVER (ORDER BY score_milli DESC,
                                       doc_id) AS BIGINT) AS rank
        FROM sc WHERE score_milli > 0
        ORDER BY rank LIMIT 20
    """
    d["above_median_length"] = rf"""
        WITH t AS (
            SELECT lang,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len({_TOKENS}) END AS BIGINT) AS n_tokens
            FROM documents),
        med AS (
            SELECT lang,
                   CAST(quantile_disc(n_tokens, 0.5) AS BIGINT)
                       AS median_tokens
            FROM t GROUP BY lang)
        SELECT m.lang, m.median_tokens,
               CAST((SELECT COUNT(*) FROM t
                     WHERE t.lang = m.lang
                       AND t.n_tokens >= m.median_tokens) AS BIGINT)
                   AS n_at_or_above
        FROM med m ORDER BY m.lang
    """
    # closed form of the REAL pixel codec path: pixel (x, y, ch) of
    # image doc_id is (x*3 + y*7 + ch*11 + doc_id) % 256; the resize
    # picks source indexes ((x*w)//8, (y*h)//8)
    d["image_pixel_stats_color"] = """
        -- per-8x8-block-constant YCbCr planes; the fixed-point BT.601
        -- integer conversion below is character-for-character the
        -- engine's _ycbcr_to_rgb (nonneg numerators: floor == trunc)
        WITH params AS (
            SELECT doc_id AS media_id,
                   4 + doc_id % 13 AS width,
                   3 + doc_id % 11 AS height,
                   8 + 8 * (doc_id % 2) AS bs
            FROM documents),
        pix AS (
            SELECT media_id, width, height, x, y,
                   (5*(x//bs) + 9*(y//bs) + 3*media_id) % 256 AS yy,
                   (7*(x//bs) + 11*(y//bs) + media_id) % 256 AS cb,
                   (13*(x//bs) + 17*(y//bs) + 5*media_id) % 256 AS cr
            FROM params, range(16) rx(x), range(13) ry(y)
            WHERE x < width AND y < height),
        rgb AS (
            SELECT media_id,
                   GREATEST(0, LEAST(255,
                       (1000000*yy + 1402000*(cr-128) + 256500000)
                           // 1000000 - 256))
                 + GREATEST(0, LEAST(255,
                       (1000000*yy - 344136*(cb-128) - 714136*(cr-128)
                        + 256500000) // 1000000 - 256))
                 + GREATEST(0, LEAST(255,
                       (1000000*yy + 1772000*(cb-128) + 256500000)
                           // 1000000 - 256)) AS s
            FROM pix),
        px AS (SELECT media_id, SUM(s) AS pixel_sum FROM rgb
               GROUP BY media_id),
        rpix AS (
            SELECT media_id,
                   (5*(((x*width)//8)//bs) + 9*(((y*height)//8)//bs)
                    + 3*media_id) % 256 AS yy,
                   (7*(((x*width)//8)//bs) + 11*(((y*height)//8)//bs)
                    + media_id) % 256 AS cb,
                   (13*(((x*width)//8)//bs) + 17*(((y*height)//8)//bs)
                    + 5*media_id) % 256 AS cr
            FROM params, range(8) rx(x), range(8) ry(y)),
        rrgb AS (
            SELECT media_id,
                   GREATEST(0, LEAST(255,
                       (1000000*yy + 1402000*(cr-128) + 256500000)
                           // 1000000 - 256))
                 + GREATEST(0, LEAST(255,
                       (1000000*yy - 344136*(cb-128) - 714136*(cr-128)
                        + 256500000) // 1000000 - 256))
                 + GREATEST(0, LEAST(255,
                       (1000000*yy + 1772000*(cb-128) + 256500000)
                           // 1000000 - 256)) AS s
            FROM rpix),
        rz AS (SELECT media_id, SUM(s) AS resized_sum FROM rrgb
               GROUP BY media_id)
        SELECT p.media_id, CAST(p.width AS BIGINT) AS width,
               CAST(p.height AS BIGINT) AS height,
               CAST(px.pixel_sum AS BIGINT) AS pixel_sum,
               CAST(rz.resized_sum AS BIGINT) AS resized_sum
        FROM params p JOIN px USING (media_id) JOIN rz USING (media_id)
    """
    d["image_pixel_stats"] = """
        WITH params AS (
            SELECT doc_id AS media_id,
                   4 + doc_id % 13 AS width,
                   3 + doc_id % 11 AS height,
                   doc_id % 4 AS fmt,
                   CASE WHEN doc_id % 4 = 0 THEN
                        CASE (doc_id // 4) % 3 WHEN 0 THEN 1
                             WHEN 1 THEN 3 ELSE 4 END
                        WHEN doc_id % 4 = 3 THEN 1
                   ELSE 3 END AS channels
            FROM documents),
        px AS (
            SELECT media_id,
                   SUM(CASE WHEN fmt = 3
                       THEN ((x//8)*5 + (y//8)*9 + media_id*3) % 256
                       ELSE (x*3 + y*7 + ch*11 + media_id) % 256
                       END) AS pixel_sum
            FROM params, range(16) rx(x), range(13) ry(y),
                 range(4) rc(ch)
            WHERE x < width AND y < height AND ch < channels
            GROUP BY media_id),
        rz AS (
            SELECT media_id,
                   SUM(CASE WHEN fmt = 3
                       THEN ((((x*width)//8)//8)*5
                             + (((y*height)//8)//8)*9
                             + media_id*3) % 256
                       ELSE (((x*width)//8)*3 + ((y*height)//8)*7
                             + ch*11 + media_id) % 256
                       END) AS resized_sum
            FROM params, range(8) rx(x), range(8) ry(y), range(4) rc(ch)
            WHERE ch < channels
            GROUP BY media_id)
        SELECT p.media_id, CAST(p.width AS BIGINT) AS width,
               CAST(p.height AS BIGINT) AS height,
               CAST(p.channels AS BIGINT) AS channels,
               CAST(px.pixel_sum AS BIGINT) AS pixel_sum,
               CAST(rz.resized_sum AS BIGINT) AS resized_sum
        FROM params p JOIN px USING (media_id) JOIN rz USING (media_id)
    """
    d["cross_doc_repetition"] = f"""
        WITH toks AS (
            SELECT doc_id, {_toks_or_empty} AS t FROM documents),
        g AS (
            SELECT doc_id,
                   array_to_string(list_slice(t, i, i + 4), ' ') AS gram
            FROM (SELECT doc_id, t,
                         unnest(generate_series(1, len(t) - 4)) AS i
                  FROM toks)),
        shared AS (
            SELECT gram FROM (
                SELECT gram, COUNT(DISTINCT doc_id) AS df
                FROM g GROUP BY gram) WHERE df >= 2),
        tot AS (
            SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id),
        sh AS (
            SELECT doc_id, COUNT(*) AS n_shared FROM g
            WHERE gram IN (SELECT gram FROM shared) GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(t.n_grams, 0) AS BIGINT) AS n_grams,
               CAST(COALESCE(s.n_shared, 0) AS BIGINT) AS n_shared,
               CAST(CASE WHEN COALESCE(t.n_grams, 0) = 0 THEN 0
                    ELSE 100 * COALESCE(s.n_shared, 0) // t.n_grams
                    END AS BIGINT) AS shared_pct
        FROM documents d LEFT JOIN tot t USING (doc_id)
                         LEFT JOIN sh s USING (doc_id)
    """
    d["mixture_plan"] = rf"""
        WITH per AS (
            SELECT source,
                   SUM(CAST(CASE WHEN trim(text) = '' THEN 0
                            ELSE len({_TOKENS}) END AS BIGINT))
                       AS n_tokens
            FROM documents GROUP BY source),
        tot AS (
            SELECT SUM(n_tokens) AS total, COUNT(*) AS n_src FROM per)
        SELECT p.source, p.n_tokens,
               CAST(CASE WHEN p.n_tokens = 0 THEN 0
                    ELSE LEAST(1000000,
                         1000000 * (t.total // (10 * t.n_src))
                         // p.n_tokens) END AS BIGINT) AS rate_ppm
        FROM per p, tot t ORDER BY p.source
    """
    d["dedup_minhash_keep_distributed"] = d["dedup_minhash_keep"]
    d["curation_pipeline"] = rf"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 500000 AS doc_id, text FROM documents
            WHERE doc_id % 6 = 0),
        toks AS (
            SELECT doc_id, text,
                   CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                        ELSE {_TOKENS} END AS t
            FROM corpus),
        feats AS (
            SELECT doc_id, text, CAST(len(t) AS BIGINT) AS n_tokens,
                   CASE WHEN len(t) - 2 <= 0 THEN 0
                        ELSE (100 * ((len(t) - 2) - len(list_distinct(
                            [array_to_string(list_slice(t, CAST(i AS INT),
                                             CAST(i AS INT) + 2), ' ')
                             for i in range(1, len(t) - 1)]))))
                             // (len(t) - 2) END AS dup_pct,
                   CAST(COALESCE(list_sum(
                       [CAST(CAST(('0x' || substr(md5(x), 1, 8))
                                  AS UBIGINT) % 21 AS BIGINT) - 10
                        for x in t]), 0) AS BIGINT) AS score
            FROM toks),
        kept1 AS (
            SELECT f.* FROM feats f
            WHERE n_tokens >= 24 AND dup_pct < 20 AND score >= 0),
        kept2 AS (
            SELECT * FROM kept1
            QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))),
        bg AS (
            SELECT DISTINCT array_to_string(list_slice(t, i, i + 7),
                                            ' ') AS gram
            FROM (SELECT doc_id, t,
                         unnest(generate_series(1, len(t) - 7)) AS i
                  FROM toks WHERE doc_id % 97 = 0)),
        hit AS (
            SELECT DISTINCT k.doc_id
            FROM (SELECT doc_id, t,
                         unnest(generate_series(1, len(t) - 7)) AS i
                  FROM toks) s
            JOIN kept2 k USING (doc_id)
            WHERE array_to_string(list_slice(s.t, s.i, s.i + 7), ' ')
                  IN (SELECT gram FROM bg)),
        kept3 AS (
            SELECT k.doc_id, k.n_tokens FROM kept2 k
            WHERE k.doc_id % 97 <> 0
              AND k.doc_id NOT IN (SELECT doc_id FROM hit)),
        packed AS (
            SELECT doc_id, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS before
            FROM kept3)
        SELECT doc_id, n_tokens,
               CAST(before // 2048 AS BIGINT) AS chunk_id,
               CAST(before % 2048 AS BIGINT) AS chunk_offset
        FROM packed
    """
    d["audio_pcm_stats"] = """
        WITH params AS (
            SELECT doc_id AS media_id,
                   CAST(8000 + (doc_id % 4) * 4000 AS BIGINT)
                       AS sample_rate,
                   100 + doc_id % 157 AS n FROM documents),
        s AS (
            SELECT media_id,
                   ABS((i*37 + media_id*11) % 4096 - 2048) AS a
            FROM params, range(257) r(i) WHERE i < n)
        SELECT p.media_id, p.sample_rate,
               CAST(p.n AS BIGINT) AS n_samples,
               CAST(SUM(s.a) AS BIGINT) AS sum_abs,
               CAST(MAX(s.a) AS BIGINT) AS peak,
               CAST(SUM(s.a * s.a) AS BIGINT) AS sum_sq
        FROM params p JOIN s USING (media_id)
        GROUP BY p.media_id, p.sample_rate, p.n
    """
    d["video_duration"] = """
        SELECT doc_id AS media_id,
               CAST(600 + (doc_id % 7) * 1000 AS BIGINT) AS timescale,
               CAST(doc_id * 997 + 5 AS BIGINT) AS duration,
               CAST(1000 * (doc_id * 997 + 5)
                    // (600 + (doc_id % 7) * 1000) AS BIGINT)
                   AS duration_ms
        FROM documents
    """
    d["events_lead"] = """
        SELECT event_id, user_id, ts,
               LEAD(event_id) OVER w AS next_event_id,
               LEAD(ts) OVER w AS next_ts,
               CAST(epoch_us(LEAD(ts) OVER w) - epoch_us(ts) AS BIGINT)
                   AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """
    d["sliding_distinct_users"] = """
        WITH uh AS (
            SELECT DISTINCT user_id, date_trunc('hour', ts) AS hour
            FROM events),
        hours AS (SELECT DISTINCT hour FROM uh)
        SELECT h.hour AS window_start,
               CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n_users
        FROM hours h JOIN uh u
          ON u.hour BETWEEN h.hour - INTERVAL 2 HOUR AND h.hour
        GROUP BY h.hour ORDER BY h.hour
    """
    return d
