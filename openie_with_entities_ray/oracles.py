"""DuckDB oracle SQL for the OIE labeler pipeline queries.

The DeterministicLabeler (state/labeler.py) is a pure function of the
sentence string built from word-list membership, suffix rules and
md5-seeded confidences — all DuckDB-expressible — so the flagship
pipeline (sentences → OIE label → decode → validity → dedup → top-k →
graph) can be recomputed end-to-end in SQL and hash-compared by the
driver. The SQL is generated from the SAME Python constants the engine
uses (VERBS/AUXILIARIES/ALIAS_DICT are interpolated as literals), so
there is one source of truth for the kernels' vocabulary.

Domain restrictions (loud, not silent — a violation changes row counts
or values and FAILS the driver compare, it never fake-passes):

- conjunction splitting is expressed only as the identity path: the
  oracle emits rows solely for sentences containing no coordinator
  token ('and'/'or'/'nor'/'&'); a corpus sentence with one would make
  engine and oracle row counts diverge. The full coordination state
  machine (metric.py:204-248 semantics) is gated by the differential
  pytest suite against the reference's own AST-extracted functions.
- the entity columns assume the alias dictionary has no hits in the
  corpus (true for the lowercase sf documents): any dictionary surface
  occurring in a triple flips c1/c3 and the ents columns on the engine
  side and mismatches.
- detect-language/CJK and curly-quote normalization branches are not
  spelled out (ASCII corpus); affected docs would hash-mismatch.

Reference parity notes for the decode shape: validity filter
(model.py:626), first-wins dedup on 'arg1 arg2 rel' (model.py:595-601),
depth cap 5 (model.py:93), apposition rel_case 1 → literal pred
'is ' with trailing space (model.py:554-593).
"""

from __future__ import annotations

from .functions.conjunctions import UNBREAKABLE_WORDS
from .state.labeler import (
    AUXILIARIES,
    LOC_PREPOSITIONS,  # noqa: F401  (folded into arg2; kept for reference)
    VERBS,
    _APPOSITION_DETS,
    _ED_NOUNS,
    _PUNCT,
)

_COORDINATORS = ("and", "or", "nor", "&")


def _sql_list(words) -> str:
    return ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(words))


def _is_verb_expr(col: str) -> str:
    """SQL boolean mirroring state.labeler.is_verb (ASCII corpus)."""
    return (
        f"(lower({col}) IN ({_sql_list(VERBS)})"
        f" OR (lower({col}) NOT IN ({_sql_list(_ED_NOUNS)})"
        f"     AND substr({col}, 1, 1) BETWEEN 'a' AND 'z'"
        f"     AND ((lower({col}) LIKE '%ed' AND len({col}) > 4)"
        f"          OR (lower({col}) LIKE '%ing' AND len({col}) > 5))))"
    )


def _norm_expr(col: str) -> str:
    """SQL mirror of stages.canonical.normalize_surface: strip ASCII
    punctuation, lower, collapse/trim spaces."""
    return (
        "trim(regexp_replace(lower(regexp_replace("
        f"{col}, '[!-/:-@\\[-`{{-~]', '', 'g')), ' +', ' ', 'g'))"
    )


def _node_expr(col: str) -> str:
    return f"'C' || substr(sha256({_norm_expr(col)}), 1, 16)"


# ---------------------------------------------------------------------------
# entity-bearing fixture corpus: deterministic source_docs rows whose
# single sentences carry alias-dictionary entities but NO coordinators,
# commas or ambiguous surfaces — i.e. inside both the OIE-SQL domain and
# the mention-maximality SQL domain. Used (engine ∪ + SQL VALUES) by the
# per_org_pairs / entity_filtered_triples hard-gate queries.

_FIX_PER = ["Alice", "Bob", "Carol", "Dave", "Erin", "Frank", "Grace"]
_FIX_ORG1 = ["Initech", "Globex", "Hooli", "Vandelay"]
_FIX_ORGMW = ["Acme Corp", "Umbrella Systems", "Stark Industries",
              "Wayne Enterprises"]
_FIX_LOC = ["London", "Tokyo", "Berlin", "Austin", "New York"]
_FIX_VERB = ["joined", "founded", "acquired", "launched"]
_FIX_ROLE = ["architect", "director", "engineer"]


def entity_fixture_docs(n: int = 48):
    """source_docs-shaped rows, pure function of the row index."""
    import hashlib

    def pick(seq, h, salt):
        return seq[(h >> salt) % len(seq)]

    docs = []
    for i in range(n):
        h = int.from_bytes(
            hashlib.md5(f"entfix:{i}".encode()).digest()[:8], "little"
        )
        per = pick(_FIX_PER, h, 0)
        per2 = pick(_FIX_PER, h, 3)
        org = pick(_FIX_ORG1, h, 6)
        orgmw = pick(_FIX_ORGMW, h, 9)
        loc = pick(_FIX_LOC, h, 12)
        verb = pick(_FIX_VERB, h, 15)
        role = pick(_FIX_ROLE, h, 18)
        kind = i % 6
        if kind == 0:      # PER verb ORG → per_org positive
            sent = f"{per} {verb} {org} ."
        elif kind == 1:    # ORG employs PER → subject-type negative
            sent = f"{org} employs {per} ."
        elif kind == 2:    # two object mentions → count negative
            sent = f"{per} {verb} {org} in {loc} ."
        elif kind == 3:    # no subject entity
            sent = f"the {role} {verb} {org} ."
        elif kind == 4:    # multiword ORG object
            sent = f"{per} {verb} {orgmw} ."
        else:              # no verb in VERBS → zero triples
            sent = f"{per} met {per2} ."
        docs.append(
            {
                "repo": "fixtures/entities",
                "path": f"fix/ent_{i}.txt",
                "commit": format(10**9 + i, "012x"),
                "lang": "en",
                "content": sent,
            }
        )
    return docs


def _fixture_sents_sql(docs) -> str:
    """The fixture docs as a UNION ALL branch of the sents CTE."""
    vals = ",\n    ".join(
        "('{r}', '{p}', '{c}', '{t}')".format(
            r=d["repo"], p=d["path"], c=d["commit"],
            t=d["content"].replace("'", "''"),
        )
        for d in docs
    )
    return f"""
  UNION ALL
  SELECT repo, path, cmt, 0::BIGINT AS sent_id,
         regexp_split_to_array(trim(txt), ' +') AS words,
         array_to_string(regexp_split_to_array(trim(txt), ' +'), ' ')
           AS sentence
  FROM (VALUES {vals}) fx(repo, path, cmt, txt)
  WHERE len(trim(txt)) > 0
    AND len(regexp_split_to_array(trim(txt), ' +')) <= 100"""


# Shared WITH-clause: documents → sentences → verb runs → decoded,
# deduped, confidence-scored triples (the flagship no-shuffle pipeline).
def _triples_cte(seed: int = 777, with_entity_fixture: bool = False) -> str:
    extra = (
        _fixture_sents_sql(entity_fixture_docs())
        if with_entity_fixture
        else ""
    )
    return f"""
WITH sents AS (
  SELECT 'corpus/' || source AS repo,
         'docs/doc_' || doc_id || '.txt' AS path,
         printf('%012x', doc_id) AS cmt,
         0::BIGINT AS sent_id,
         regexp_split_to_array(trim(text), ' +') AS words,
         array_to_string(regexp_split_to_array(trim(text), ' +'), ' ')
           AS sentence
  FROM documents
  WHERE len(trim(text)) > 0
    AND len(regexp_split_to_array(trim(text), ' +')) <= 100{extra}
), toks AS (
  SELECT path, unnest(words) AS w,
         generate_subscripts(words, 1)::BIGINT AS pos
  FROM sents
), vt AS (
  SELECT path, pos, w, {_is_verb_expr('w')} AS isv,
         ({_is_verb_expr('w')}
          OR lower(w) IN ({_sql_list(AUXILIARIES)})) AS runnable
  FROM toks
), marked AS (
  SELECT *, SUM(CASE WHEN runnable THEN 0 ELSE 1 END)
              OVER (PARTITION BY path ORDER BY pos) AS grp
  FROM vt
), runs0 AS (
  -- verb run = maximal island of verb/auxiliary tokens, starting at the
  -- island's FIRST verb (aux-only prefixes are skipped by the scan)
  SELECT path, grp,
         MIN(CASE WHEN isv THEN pos END) AS vstart,
         MAX(pos) AS vend
  FROM marked WHERE runnable
  GROUP BY path, grp
  HAVING MIN(CASE WHEN isv THEN pos END) IS NOT NULL
), runs AS (
  SELECT path, vstart, vend,
         row_number() OVER (PARTITION BY path ORDER BY vstart) - 1 AS depth
  FROM runs0
), nruns AS (
  SELECT path, COUNT(*) AS n_runs FROM runs GROUP BY path
), bounds AS (
  SELECT path, list_sort(list(pos)) AS bps
  FROM toks WHERE w IN ({_sql_list(_PUNCT)})
  GROUP BY path
), verb_triples AS (
  SELECT s.repo, s.path, s.cmt, s.sent_id, s.sentence, r.depth,
         CASE WHEN x.lo >= r.vstart THEN
             CASE WHEN x.first_b IS NOT NULL AND x.first_b < r.vstart
                  THEN COALESCE(
                    array_to_string(s.words[1:x.first_b - 1], ' '), '')
                  ELSE '' END
         ELSE COALESCE(
           array_to_string(s.words[x.lo:r.vstart - 1], ' '), '') END AS arg1,
         COALESCE(array_to_string(s.words[r.vstart:r.vend], ' '), '')
           AS rel,
         COALESCE(array_to_string(s.words[r.vend + 1:x.hi], ' '), '')
           AS arg2
  FROM runs r
  JOIN sents s ON s.path = r.path
  LEFT JOIN bounds b ON b.path = r.path,
  LATERAL (SELECT
     COALESCE(list_max(list_filter(COALESCE(b.bps, []::BIGINT[]),
                                   p -> p < r.vstart)) + 1, 1) AS lo,
     COALESCE(list_min(list_filter(COALESCE(b.bps, []::BIGINT[]),
                                   p -> p > r.vstart)) - 1,
              len(s.words)) AS hi,
     CASE WHEN len(COALESCE(b.bps, []::BIGINT[])) > 0
          THEN b.bps[1] END AS first_b) x
  WHERE r.depth < 5
), appos_c AS (
  -- first comma followed by a determiner (not sentence-initial/final)
  SELECT t.path, MIN(t.pos) AS c
  FROM toks t JOIN sents s ON s.path = t.path
  WHERE t.w = ',' AND t.pos >= 2 AND t.pos <= len(s.words) - 1
    AND lower(s.words[t.pos + 1]) IN ({_sql_list(_APPOSITION_DETS)})
  GROUP BY t.path
), appos_triples AS (
  SELECT s.repo, s.path, s.cmt, s.sent_id, s.sentence,
         COALESCE(n.n_runs, 0) AS depth,
         COALESCE(array_to_string(s.words[1:a.c - 1], ' '), '') AS arg1,
         'is ' AS rel,
         COALESCE(array_to_string(s.words[a.c + 1:x.hi2], ' '), '') AS arg2
  FROM appos_c a
  JOIN sents s ON s.path = a.path
  LEFT JOIN nruns n ON n.path = a.path
  LEFT JOIN bounds b ON b.path = a.path,
  LATERAL (SELECT
     COALESCE(list_min(list_filter(COALESCE(b.bps, []::BIGINT[]),
                                   p -> p > a.c)) - 1,
              len(s.words)) AS hi2) x
  WHERE COALESCE(n.n_runs, 0) < 5
), raw_triples AS (
  SELECT * FROM verb_triples WHERE arg1 <> '' AND rel <> ''
  UNION ALL
  SELECT * FROM appos_triples WHERE arg1 <> ''
), triples AS (
  SELECT repo, path, cmt, sent_id, 0::BIGINT AS split_id,
         depth::BIGINT AS depth, sentence, arg1, rel, arg2,
         (95 - 8 * depth
          + CAST(round((4.0 * ((md5_number_upper(
                '{seed}|' || sentence || '|' || depth::VARCHAR)
                & 255::UBIGINT)::BIGINT)) / 255.0) AS BIGINT))::BIGINT
           AS conf_centi
  FROM raw_triples
  QUALIFY row_number() OVER (
     PARTITION BY path, sent_id, arg1, arg2, rel ORDER BY depth) = 1
)"""


def sql_triples() -> str:
    return (
        _triples_cte()
        + """
SELECT repo, path, cmt AS "commit", sent_id, split_id, depth,
       arg1, rel, arg2, conf_centi
FROM triples
"""
    )


def sql_conj_splits() -> str:
    """Identity-split rows for coordinator-free sentences (see module
    docstring: a coordinator-bearing sentence is emitted by the engine
    but not the oracle → loud row-count failure, never a silent pass)."""
    return (
        _triples_cte()
        + f"""
SELECT repo, path, cmt AS "commit", sent_id, 0::BIGINT AS split_id,
       sentence AS split_sentence, sentence AS orig_sentence
FROM sents
WHERE len(list_filter(words,
        x -> lower(x) IN ({_sql_list(_COORDINATORS)}))) = 0
"""
    )


def sql_predicate_freq() -> str:
    return (
        _triples_cte()
        + f"""
SELECT rel_norm, COUNT(*)::BIGINT AS n
FROM (SELECT {_norm_expr('rel')} AS rel_norm FROM triples)
WHERE rel_norm <> ''
GROUP BY rel_norm
"""
    )


def sql_graph_nodes() -> str:
    return (
        _triples_cte()
        + f"""
, surf AS (
  SELECT arg1 AS surface FROM triples
  UNION ALL
  SELECT arg2 FROM triples
), normed AS (
  SELECT {_norm_expr('surface')} AS surface_norm, surface FROM surf
)
SELECT 'C' || substr(sha256(surface_norm), 1, 16) AS node_id,
       surface_norm, MIN(surface) AS surface,
       COUNT(*)::BIGINT AS n_mentions
FROM normed
GROUP BY surface_norm
"""
    )


def sql_graph_edges() -> str:
    return (
        _triples_cte()
        + f"""
, edges AS (
  SELECT {_node_expr('arg1')} AS src, {_node_expr('arg2')} AS dst,
         rel, conf_centi, repo, path, cmt, sent_id
  FROM triples
)
SELECT src, dst, rel, conf_centi, repo, path, cmt AS "commit", sent_id
FROM edges
QUALIFY row_number() OVER (PARTITION BY src, rel, dst
        ORDER BY conf_centi DESC, repo, path, cmt, sent_id) = 1
"""
    )


def sql_pagerank(iterations: int = 3, scale: int = 10**12,
                 edges_sql: str | None = None) -> str:
    """Integer-exact PageRank oracle: the same floor-division recurrence
    as stages/graph_algos.py:pagerank_join, unrolled to ``iterations``
    chained CTEs (no recursive float accumulation; every intermediate is
    BIGINT so DuckDB and Python agree bit-for-bit). ``edges_sql``
    defaults to the flagship edge table; tests inject a literal edge
    list to gate the recurrence itself."""
    its = []
    prev = "pr0"
    for k in range(1, iterations + 1):
        its.append(f"""it{k} AS (
  SELECT v.node_id,
         ((15 * {scale}::HUGEINT) // (100 * (SELECT n FROM nn)))::BIGINT
         + (85 * COALESCE(s.s, 0)) // 100 AS pr
  FROM nodes v LEFT JOIN (
    SELECT ed.dst AS node_id, sum({prev}.pr // outdeg.d)::BIGINT AS s
    FROM ed
    JOIN {prev} ON {prev}.node_id = ed.src
    JOIN outdeg ON outdeg.src = ed.src
    GROUP BY ed.dst
  ) s USING (node_id)
)""")
        prev = f"it{k}"
    its_sql = ",\n".join(its)
    if edges_sql is None:
        edges_sql = sql_graph_edges()
    return f"""
WITH edges AS (
{edges_sql}
), ed AS (
  SELECT DISTINCT src, dst FROM edges
), nodes AS (
  SELECT src AS node_id FROM ed UNION SELECT dst AS node_id FROM ed
), nn AS (
  SELECT count(*)::HUGEINT AS n FROM nodes
), outdeg AS (
  SELECT src, count(*)::BIGINT AS d FROM ed GROUP BY src
), pr0 AS (
  SELECT node_id,
         ({scale}::HUGEINT // (SELECT n FROM nn))::BIGINT AS pr
  FROM nodes
),
{its_sql}
SELECT node_id, pr::BIGINT AS pr_scaled FROM {prev}
"""


def sql_edge_provenance(k: int = 3) -> str:
    """Lineage oracle: per (src, rel, dst) witness count + first-k
    sorted ``repo:path:sent_id`` refs — mirror of
    stages/graph.py:edge_provenance (binary-collation sort on both
    sides)."""
    return (
        _triples_cte()
        + f"""
, edges AS (
  SELECT {_node_expr('arg1')} AS src, {_node_expr('arg2')} AS dst,
         rel, repo, path, sent_id
  FROM triples
)
SELECT src, rel, dst, count(*)::BIGINT AS n_witnesses,
       array_to_string(
         (list_sort(list(repo || ':' || path || ':' || sent_id::VARCHAR)))
           [1:{k}],
         ',') AS witnesses
FROM edges GROUP BY 1, 2, 3
"""
    )


def sql_kg_snapshot_diff() -> str:
    """Snapshot-diff oracle: max-conf deduped edges over the even-commit
    half vs the full corpus, full-joined on the edge key, only the
    differing rows — mirror of stages/graph.py:kg_snapshot_diff over
    queries.q_kg_snapshot_diff's snapshot split."""
    return (
        _triples_cte()
        + f"""
, raw AS (
  SELECT {_node_expr('arg1')} AS src, rel, {_node_expr('arg2')} AS dst,
         conf_centi, cmt
  FROM triples
), ea AS (
  SELECT src, rel, dst, max(conf_centi) AS conf_centi FROM raw
  WHERE right(cmt, 1) IN ('0','2','4','6','8','a','c','e')
  GROUP BY 1, 2, 3
), eb AS (
  SELECT src, rel, dst, max(conf_centi) AS conf_centi FROM raw
  GROUP BY 1, 2, 3
)
SELECT coalesce(ea.src, eb.src) AS src,
       coalesce(ea.rel, eb.rel) AS rel,
       coalesce(ea.dst, eb.dst) AS dst,
       CASE WHEN ea.src IS NULL THEN 'added'
            WHEN eb.src IS NULL THEN 'removed'
            ELSE 'changed' END AS status,
       coalesce(ea.conf_centi, -1)::BIGINT AS conf_a,
       coalesce(eb.conf_centi, -1)::BIGINT AS conf_b
FROM ea FULL JOIN eb
  ON ea.src = eb.src AND ea.rel = eb.rel AND ea.dst = eb.dst
WHERE ea.src IS NULL OR eb.src IS NULL
   OR ea.conf_centi <> eb.conf_centi
"""
    )


def sql_kcore(k: int = 2, rounds: int = 5,
              edges_sql: str | None = None) -> str:
    """Fixed-round k-core peel oracle: the same degree → filter →
    edge-restrict rounds as stages/graph_algos.py:kcore_join, unrolled
    to ``rounds`` chained CTEs; final output is the degree table of
    the surviving edge set."""
    # every e{r}/n{r} is referenced 2-3 times by the next level; DuckDB
    # inlines plain CTEs, so without MATERIALIZED the triples subtree
    # re-evaluates ~3^rounds times (measured: >5 min at sf0.01 vs
    # seconds materialized)
    its = []
    prev = "e0"
    for r in range(1, rounds + 1):
        its.append(f"""n{r} AS MATERIALIZED (
  SELECT src AS node_id FROM {prev} GROUP BY 1 HAVING count(*) >= {k}
), e{r} AS MATERIALIZED (
  SELECT e.src, e.dst FROM {prev} e
  JOIN n{r} a ON a.node_id = e.src
  JOIN n{r} b ON b.node_id = e.dst
)""")
        prev = f"e{r}"
    its_sql = ",\n".join(its)
    if edges_sql is None:
        edges_sql = sql_graph_edges()
    return f"""
WITH edges AS MATERIALIZED (
{edges_sql}
), d AS (
  SELECT DISTINCT src, dst FROM edges WHERE src <> dst
), e0 AS MATERIALIZED (
  SELECT src, dst FROM d UNION SELECT dst, src FROM d
),
{its_sql}
SELECT src AS node_id, count(*)::BIGINT AS deg
FROM {prev} GROUP BY 1
"""


def sql_label_propagation(iterations: int = 3,
                          edges_sql: str | None = None) -> str:
    """Deterministic synchronous label propagation oracle: the same
    most-frequent-neighbor-label update (ties → smallest label, binary
    collation) as stages/graph_algos.py:label_propagation_join,
    unrolled to ``iterations`` chained CTEs. ``edges_sql`` defaults to
    the flagship edge table; tests inject literal edge lists to gate
    the update rule itself."""
    its = []
    prev = "l0"
    for k in range(1, iterations + 1):
        its.append(f"""v{k} AS (
  SELECT u.dst AS node_id, l.label, count(*) AS c
  FROM und u JOIN {prev} l ON l.node_id = u.src
  GROUP BY 1, 2
), l{k} AS (
  SELECT node_id, label FROM (
    SELECT node_id, label,
           row_number() OVER (PARTITION BY node_id
                              ORDER BY c DESC, label ASC) AS rn
    FROM v{k}) WHERE rn = 1
)""")
        prev = f"l{k}"
    its_sql = ",\n".join(its)
    if edges_sql is None:
        edges_sql = sql_graph_edges()
    return f"""
WITH edges AS (
{edges_sql}
), d AS (
  SELECT DISTINCT src, dst FROM edges WHERE src <> dst
), und AS (
  SELECT src, dst FROM d UNION SELECT dst, src FROM d
), l0 AS (
  SELECT DISTINCT src AS node_id, src AS label FROM und
),
{its_sql}
SELECT node_id, label FROM {prev}
"""


def sql_components() -> str:
    """Connected components of the deduped edge graph: min-reachable-node
    label per node via a recursive CTE — the SQL mirror of
    stages/graph_algos.py:connected_components_join's min-label fixpoint
    (node ids are ASCII 'C'+hex, so DuckDB's binary-collation MIN and
    Python's codepoint-order min agree)."""
    return f"""
WITH RECURSIVE edges AS (
{sql_graph_edges()}
), adj AS (
  SELECT src AS node_id, dst AS nbr FROM edges
  UNION
  SELECT dst AS node_id, src AS nbr FROM edges
), reach AS (
  SELECT node_id, node_id AS label
  FROM (SELECT DISTINCT node_id FROM adj) n
  UNION
  SELECT a.node_id, r.label
  FROM adj a JOIN reach r ON a.nbr = r.node_id
)
SELECT node_id, MIN(label) AS component
FROM reach
GROUP BY node_id
"""


def _ents_cte() -> str:
    """triples + entity/violation columns via alias-dictionary occurrence
    tests (exact when the dictionary has zero corpus hits — see module
    docstring)."""
    from .state.ner import ALIAS_DICT

    surfaces = _sql_list(ALIAS_DICT)
    mw = [s for s in ALIAS_DICT if " " in s]
    mw_list = _sql_list(mw) if mw else "''"
    return (
        _triples_cte()
        + f"""
, ents AS (
  SELECT *,
    len(list_filter([{surfaces}],
        s -> contains(' ' || arg1 || ' ', ' ' || s || ' '))) AS occ1,
    len(list_filter([{surfaces}],
        s -> contains(' ' || rel || ' ', ' ' || s || ' '))) AS occr,
    len(list_filter([{surfaces}],
        s -> contains(' ' || arg2 || ' ', ' ' || s || ' '))) AS occ2,
    len(list_filter([{mw_list}], s ->
        contains(' ' || sentence || ' ', ' ' || s || ' ')
        AND NOT (contains(arg1, s) OR contains(rel, s)
                 OR contains(arg2, s))
        AND ((CASE WHEN list_has_any(string_split(arg1, ' '),
                                     string_split(s, ' '))
              THEN 1 ELSE 0 END)
           + (CASE WHEN list_has_any(string_split(rel, ' '),
                                     string_split(s, ' '))
              THEN 1 ELSE 0 END)
           + (CASE WHEN list_has_any(string_split(arg2, ' '),
                                     string_split(s, ' '))
              THEN 1 ELSE 0 END)) > 1)) AS seg
  FROM triples
)"""
    )


def sql_triples_entities() -> str:
    return (
        _ents_cte()
        + """
SELECT repo, path, cmt AS "commit", sent_id, split_id, depth,
       arg1, rel, arg2, conf_centi,
       '' AS subj_ents_s, '' AS subj_types_s,
       '' AS obj_ents_s, '' AS obj_types_s, '' AS rel_ents_s,
       (occ1 = 0 AND occ2 = 0) AS viol_c1,
       (occ1 > 1 OR occ2 > 1) AS viol_c2,
       (occr > 0) AS viol_c3,
       (seg > 0) AS viol_c4
FROM ents
"""
    )


def sql_violations() -> str:
    return (
        _ents_cte()
        + """
SELECT SUM(CASE WHEN occ1 = 0 AND occ2 = 0 THEN 1 ELSE 0 END)::BIGINT
         AS c1,
       SUM(CASE WHEN occ1 > 1 OR occ2 > 1 THEN 1 ELSE 0 END)::BIGINT
         AS c2,
       SUM(CASE WHEN occr > 0 THEN 1 ELSE 0 END)::BIGINT AS c3,
       SUM(CASE WHEN seg > 0 THEN 1 ELSE 0 END)::BIGINT AS c4,
       COUNT(*)::BIGINT AS total
FROM ents
"""
    )


# ---------------------------------------------------------------------------
# coordination fixture: single-coordination sentences that exercise the
# REAL conj label → decode → split path (label_conj walk semantics,
# 'nor'/'&' drop, unbreakable-word veto, multi-token and comma-separated
# conjuncts) while staying inside the one-coordination SQL domain.

_CNOUN = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "sigma",
          "kappa"]
_COBJ = ["rows", "cols", "nodes", "edges", "blocks"]
_CVERB = ["joined", "founded", "launched", "acquired"]


def coordination_fixture_docs(n: int = 36):
    """source_docs-shaped rows, one sentence each, pure fn of index."""
    import hashlib

    def pick(seq, h, salt):
        return seq[(h >> salt) % len(seq)]

    docs = []
    for i in range(n):
        h = int.from_bytes(
            hashlib.md5(f"coordfix:{i}".encode()).digest()[:8], "little"
        )
        a = pick(_CNOUN, h, 0)
        b = pick(_CNOUN, h, 3)
        c = pick(_CNOUN, h, 6)
        obj = pick(_COBJ, h, 9)
        obj2 = pick(_COBJ, h, 12)
        verb = pick(_CVERB, h, 15)
        kind = i % 7
        if kind == 0:    # comma list + and → 3-way split
            sent = f"{a} , {b} and {c} {verb} {obj} ."
        elif kind == 1:  # plain pair
            sent = f"{a} and {b} {verb} {obj} ."
        elif kind == 2:  # unbreakable veto → identity
            sent = f"the sum of {a} and {b} increased ."
        elif kind == 3:  # object coordination
            sent = f"{a} {verb} {obj} and {obj2} ."
        elif kind == 4:  # 'or'
            sent = f"{a} or {b} {verb} {obj} ."
        elif kind == 5:  # 'nor' → labeled but dropped → identity
            sent = f"{a} nor {b} {verb} {obj} ."
        else:            # multi-token conjuncts
            sent = f"{a} {b} and {c} {a} {verb} {obj} ."
        docs.append(
            {
                "repo": "fixtures/coordination",
                "path": f"fix/coord_{i}.txt",
                "commit": format(2 * 10**9 + i, "012x"),
                "lang": "en",
                "content": sent,
            }
        )
    return docs


def _usents_cte() -> str:
    """Shared WITH-text ending in ``usents`` — the conj-SPLIT sentences
    (documents ∪ coordination fixture) with the REAL split semantics in
    SQL for the single-coordination domain:

    - cc = the one coordinator token at 0-based position in [1, n-3]
      (sentences with >=2 in-range coordinators are EXCLUDED from the
      oracle → engine rows would be unmatched → loud failure);
    - right conjunct: maximal run after cc of non-stopper tokens
      (stopper = punctuation / coordinator / function word / verb),
      capped at 4 tokens and at word n-2 (0-based), per the label_conj
      walk (state/labeler.py:label_conj);
    - left conjuncts: the non-stopper region before cc (commas allowed)
      split on commas;
    - an invalid coordination (no right/left conjunct), a 'nor'/'&'
      coordinator (data.py:628-631) or an unbreakable word before the
      first conjunct (data.py:786-807) → identity row;
    - a valid coordination → one row per conjunct: prefix + conjunct +
      suffix (the reference's coords_to_sentences expansion for one
      coordination)."""
    from .state.labeler import _FUNCTION_WORDS

    coords = _sql_list(_COORDINATORS)
    stop_words = _sql_list(set(_FUNCTION_WORDS) | set(_COORDINATORS))
    unbreak = _sql_list(UNBREAKABLE_WORDS)
    fixture = _fixture_sents_sql(coordination_fixture_docs())
    return f"""
WITH sents AS (
  SELECT 'corpus/' || source AS repo,
         'docs/doc_' || doc_id || '.txt' AS path,
         printf('%012x', doc_id) AS cmt,
         0::BIGINT AS sent_id,
         regexp_split_to_array(trim(text), ' +') AS words,
         array_to_string(regexp_split_to_array(trim(text), ' +'), ' ')
           AS sentence
  FROM documents
  WHERE len(trim(text)) > 0
    AND len(regexp_split_to_array(trim(text), ' +')) <= 100{fixture}
), toks AS (
  SELECT path, unnest(words) AS w,
         generate_subscripts(words, 1)::BIGINT AS pos
  FROM sents
), ccs AS (
  SELECT t.path, t.pos AS cc, COUNT(*) OVER (PARTITION BY t.path) AS n_cc
  FROM toks t JOIN sents s ON s.path = t.path
  WHERE lower(t.w) IN ({coords})
    AND t.pos BETWEEN 2 AND len(s.words) - 2
), stoppers AS (
  SELECT path, pos, (w = ',') AS is_comma
  FROM toks
  WHERE w IN ({_sql_list(_PUNCT)})
     OR lower(w) IN ({stop_words})
     OR {_is_verb_expr('w')}
), coordn AS (
  SELECT c.path, c.cc, s.words, s.sentence, len(s.words) AS n,
         LEAST(
           COALESCE((SELECT MIN(st.pos) - 1 FROM stoppers st
                     WHERE st.path = c.path AND st.pos > c.cc),
                    len(s.words)),
           len(s.words) - 1, c.cc + 4) AS rend,
         COALESCE((SELECT MAX(st.pos) FROM stoppers st
                   WHERE st.path = c.path AND st.pos < c.cc
                     AND NOT st.is_comma), 0) + 1 AS lstart
  FROM ccs c JOIN sents s ON s.path = c.path
  WHERE c.n_cc = 1
), valid AS (
  SELECT co.*,
         (SELECT list_sort(list(t.pos)) FROM toks t
          WHERE t.path = co.path AND t.pos BETWEEN co.lstart AND co.cc - 1
            AND t.w = ',') AS commas
  FROM coordn co
  WHERE co.rend >= co.cc + 1 AND co.lstart <= co.cc - 1
), spans AS (
  -- left conjuncts = comma-split runs of [lstart, cc-1]; right conjunct
  -- appended last. bounds = [lstart-1] + commas + [cc] → span k =
  -- (bounds[k]+1, bounds[k+1]-1), kept when nonempty.
  SELECT v.*, sp.k, sp.s, sp.e
  FROM valid v,
  LATERAL (
    SELECT k, b[k] + 1 AS s, b[k + 1] - 1 AS e
    FROM (SELECT list_concat(
            list_concat([v.lstart - 1], COALESCE(v.commas, []::BIGINT[])),
            [v.cc]) AS b),
         unnest(range(1, len(b))) AS rk(k)
    WHERE b[k] + 1 <= b[k + 1] - 1
    UNION ALL
    SELECT 1000 AS k, v.cc + 1 AS s, v.rend AS e
  ) sp
), nspans AS (
  SELECT path, COUNT(*) AS n_conj, MIN(s) AS first_s
  FROM spans GROUP BY path
), splittable AS (
  -- >=2 conjuncts, not 'nor'/'&', no unbreakable word before the first
  SELECT sp.*, row_number() OVER (
           PARTITION BY sp.path ORDER BY sp.s) - 1 AS split_id
  FROM spans sp
  JOIN nspans ns ON ns.path = sp.path
  WHERE ns.n_conj >= 2
    AND sp.words[sp.cc] NOT IN ('nor', '&')
    AND NOT EXISTS (
      SELECT 1 FROM toks t
      WHERE t.path = sp.path AND t.pos < ns.first_s
        AND lower(t.w) IN ({unbreak}))
), split_rows AS (
  SELECT s.repo, s.path, s.cmt, s.sent_id, sp.split_id,
         regexp_replace(
           trim(COALESCE(
                  array_to_string(s.words[1:ns.first_s - 1], ' '), '')
             || ' ' || array_to_string(s.words[sp.s:sp.e], ' ') || ' '
             || COALESCE(array_to_string(
                  s.words[(SELECT MAX(e) FROM spans x
                           WHERE x.path = sp.path) + 1:len(s.words)], ' '),
                  '')),
           ' +', ' ', 'g') AS split_sentence,
         s.sentence AS orig_sentence
  FROM splittable sp
  JOIN sents s ON s.path = sp.path
  JOIN nspans ns ON ns.path = sp.path
), usents AS (
  SELECT repo, path, cmt, sent_id, split_id, split_sentence,
         orig_sentence
  FROM split_rows
  UNION ALL
  SELECT repo, path, cmt, sent_id, 0::BIGINT, sentence, sentence
  FROM sents s
  WHERE NOT EXISTS (SELECT 1 FROM split_rows sr WHERE sr.path = s.path)
    AND NOT EXISTS (SELECT 1 FROM ccs c
                    WHERE c.path = s.path AND c.n_cc >= 2)
)"""


def sql_conj_splits_coord() -> str:
    return (
        _usents_cte()
        + """
SELECT repo, path, cmt AS "commit", sent_id, split_id,
       split_sentence, orig_sentence
FROM usents
"""
    )


def sql_triples_coord(seed: int = 777) -> str:
    """The FULL splitpredict composition under the hard gate: conj-split
    each sentence (usents), OIE-label + decode each SPLIT sentence,
    first-wins dedup across a sentence's splits in (split_id, depth)
    order, then top-5 by confidence (stable: split_id, depth tie-break) —
    run.py:161-243 / model.py:595-634 semantics as one SQL query."""
    return (
        _usents_cte()
        + f"""
, utoks AS (
  SELECT path, split_id,
         unnest(string_split(split_sentence, ' ')) AS w,
         generate_subscripts(string_split(split_sentence, ' '), 1)::BIGINT
           AS pos
  FROM usents
), uvt AS (
  SELECT path, split_id, pos, w, {_is_verb_expr('w')} AS isv,
         ({_is_verb_expr('w')}
          OR lower(w) IN ({_sql_list(AUXILIARIES)})) AS runnable
  FROM utoks
), umarked AS (
  SELECT *, SUM(CASE WHEN runnable THEN 0 ELSE 1 END)
              OVER (PARTITION BY path, split_id ORDER BY pos) AS grp
  FROM uvt
), uruns0 AS (
  SELECT path, split_id, grp,
         MIN(CASE WHEN isv THEN pos END) AS vstart,
         MAX(pos) AS vend
  FROM umarked WHERE runnable
  GROUP BY path, split_id, grp
  HAVING MIN(CASE WHEN isv THEN pos END) IS NOT NULL
), uruns AS (
  SELECT path, split_id, vstart, vend,
         row_number() OVER (PARTITION BY path, split_id
                            ORDER BY vstart) - 1 AS depth
  FROM uruns0
), unruns AS (
  SELECT path, split_id, COUNT(*) AS n_runs
  FROM uruns GROUP BY path, split_id
), ubounds AS (
  SELECT path, split_id, list_sort(list(pos)) AS bps
  FROM utoks WHERE w IN ({_sql_list(_PUNCT)})
  GROUP BY path, split_id
), uverb AS (
  SELECT u.repo, u.path, u.cmt, u.sent_id, u.split_id, u.split_sentence,
         string_split(u.split_sentence, ' ') AS swords, r.depth,
         CASE WHEN x.lo >= r.vstart THEN
             CASE WHEN x.first_b IS NOT NULL AND x.first_b < r.vstart
                  THEN COALESCE(array_to_string(
                    string_split(u.split_sentence, ' ')[1:x.first_b - 1],
                    ' '), '')
                  ELSE '' END
         ELSE COALESCE(array_to_string(
           string_split(u.split_sentence, ' ')[x.lo:r.vstart - 1], ' '),
           '') END AS arg1,
         COALESCE(array_to_string(
           string_split(u.split_sentence, ' ')[r.vstart:r.vend], ' '), '')
           AS rel,
         COALESCE(array_to_string(
           string_split(u.split_sentence, ' ')[r.vend + 1:x.hi], ' '), '')
           AS arg2
  FROM uruns r
  JOIN usents u ON u.path = r.path AND u.split_id = r.split_id
  LEFT JOIN ubounds b ON b.path = r.path AND b.split_id = r.split_id,
  LATERAL (SELECT
     COALESCE(list_max(list_filter(COALESCE(b.bps, []::BIGINT[]),
                                   p -> p < r.vstart)) + 1, 1) AS lo,
     COALESCE(list_min(list_filter(COALESCE(b.bps, []::BIGINT[]),
                                   p -> p > r.vstart)) - 1,
              len(string_split(u.split_sentence, ' '))) AS hi,
     CASE WHEN len(COALESCE(b.bps, []::BIGINT[])) > 0
          THEN b.bps[1] END AS first_b) x
  WHERE r.depth < 5
), uappos_c AS (
  SELECT t.path, t.split_id, MIN(t.pos) AS c
  FROM utoks t JOIN usents u
    ON u.path = t.path AND u.split_id = t.split_id
  WHERE t.w = ',' AND t.pos >= 2
    AND t.pos <= len(string_split(u.split_sentence, ' ')) - 1
    AND lower(string_split(u.split_sentence, ' ')[t.pos + 1])
        IN ({_sql_list(_APPOSITION_DETS)})
  GROUP BY t.path, t.split_id
), uappos AS (
  SELECT u.repo, u.path, u.cmt, u.sent_id, u.split_id, u.split_sentence,
         string_split(u.split_sentence, ' ') AS swords,
         COALESCE(n.n_runs, 0) AS depth,
         COALESCE(array_to_string(
           string_split(u.split_sentence, ' ')[1:a.c - 1], ' '), '')
           AS arg1,
         'is ' AS rel,
         COALESCE(array_to_string(
           string_split(u.split_sentence, ' ')[a.c + 1:x.hi2], ' '), '')
           AS arg2
  FROM uappos_c a
  JOIN usents u ON u.path = a.path AND u.split_id = a.split_id
  LEFT JOIN unruns n ON n.path = a.path AND n.split_id = a.split_id
  LEFT JOIN ubounds b ON b.path = a.path AND b.split_id = a.split_id,
  LATERAL (SELECT
     COALESCE(list_min(list_filter(COALESCE(b.bps, []::BIGINT[]),
                                   p -> p > a.c)) - 1,
              len(string_split(u.split_sentence, ' '))) AS hi2) x
  WHERE COALESCE(n.n_runs, 0) < 5
), uraw AS (
  SELECT repo, path, cmt, sent_id, split_id, split_sentence, depth,
         arg1, rel, arg2
  FROM uverb WHERE arg1 <> '' AND rel <> ''
  UNION ALL
  SELECT repo, path, cmt, sent_id, split_id, split_sentence, depth,
         arg1, rel, arg2
  FROM uappos WHERE arg1 <> ''
), udeduped AS (
  SELECT repo, path, cmt, sent_id, split_id::BIGINT AS split_id,
         depth::BIGINT AS depth, arg1, rel, arg2,
         (95 - 8 * depth
          + CAST(round((4.0 * ((md5_number_upper(
                '{seed}|' || split_sentence || '|' || depth::VARCHAR)
                & 255::UBIGINT)::BIGINT)) / 255.0) AS BIGINT))::BIGINT
           AS conf_centi
  FROM uraw
  QUALIFY row_number() OVER (
     PARTITION BY path, sent_id, arg1, arg2, rel
     ORDER BY split_id, depth) = 1
)
SELECT repo, path, cmt AS "commit", sent_id, split_id, depth,
       arg1, rel, arg2, conf_centi
FROM udeduped
QUALIFY row_number() OVER (PARTITION BY path, sent_id
        ORDER BY conf_centi DESC, split_id, depth) <= 5
"""
    )


def _surf_values() -> str:
    """(surface, linked type) literals from the alias dictionary.
    Ambiguous surfaces (>1 candidate — linking needs the cosine scorer)
    are typed 'AMBIG': they never satisfy a PER/ORG predicate, so an
    engine that links one produces a row the oracle lacks → loud fail."""
    from .state.ner import ALIAS_DICT

    rows = []
    for s in sorted(ALIAS_DICT):
        cands = ALIAS_DICT[s]
        typ = cands[0][1] if len(cands) == 1 else "AMBIG"
        rows.append("('{s}', '{t}')".format(s=s.replace("'", "''"), t=typ))
    return ",\n    ".join(rows)


# mention model in SQL: a dictionary surface "occurs" in a text when it
# appears as a token subsequence (texts are single-spaced); a mention is
# a MAXIMAL occurrence (not an infix of another occurring surface) —
# equal to the greedy longest-match tagger on corpora where no surface
# occurs both standalone and inside a longer match (the fixture is
# constructed that way; the sf corpus has zero occurrences).
def _mention_cte(name: str, text_expr: str) -> str:
    return f"""
, {name}0 AS (
  SELECT tr.path, tr.sent_id, tr.depth, f.s, f.typ
  FROM triples tr JOIN surf f
    ON contains(' ' || {text_expr} || ' ', ' ' || f.s || ' ')
), {name} AS (
  SELECT o.* FROM {name}0 o
  WHERE NOT EXISTS (
    SELECT 1 FROM {name}0 l
    WHERE l.path = o.path AND l.sent_id = o.sent_id
      AND l.depth = o.depth AND l.s <> o.s
      AND contains(' ' || l.s || ' ', ' ' || o.s || ' '))
)"""


def sql_per_org_pairs() -> str:
    """A8 (pubmed_analysis.py:60-84): subject = exactly one PER mention,
    object = exactly one ORG mention, over documents ∪ entity fixture."""
    return (
        _triples_cte(with_entity_fixture=True)
        + f"""
, surf(s, typ) AS (VALUES {_surf_values()})"""
        + _mention_cte("m1", "tr.arg1")
        + _mention_cte("m2", "tr.arg2")
        + """
, subj AS (
  SELECT path, sent_id, depth, COUNT(*) AS n, MIN(typ) AS typ
  FROM m1 GROUP BY 1, 2, 3
), obj AS (
  SELECT path, sent_id, depth, COUNT(*) AS n, MIN(typ) AS typ
  FROM m2 GROUP BY 1, 2, 3
)
SELECT tr.path, tr.sent_id, tr.arg1, tr.rel, tr.arg2
FROM triples tr
JOIN subj ON subj.path = tr.path AND subj.sent_id = tr.sent_id
         AND subj.depth = tr.depth AND subj.n = 1 AND subj.typ = 'PER'
JOIN obj ON obj.path = tr.path AND obj.sent_id = tr.sent_id
        AND obj.depth = tr.depth AND obj.n = 1 AND obj.typ = 'ORG'
"""
    )


def sql_entity_filtered_triples() -> str:
    """J4 baseline (scripts/baselines.py:50-88): subject exactly equals a
    sentence entity (case-insensitive), exactly one entity inside the
    object, object ends with it → rewrite to entity-bounded form."""
    return (
        _triples_cte(with_entity_fixture=True)
        + f"""
, surf(s, typ) AS (VALUES {_surf_values()})
, sment0 AS (
  SELECT DISTINCT tr.path, tr.sent_id, f.s
  FROM triples tr JOIN surf f
    ON contains(' ' || tr.sentence || ' ', ' ' || f.s || ' ')
), sment AS (
  SELECT o.* FROM sment0 o
  WHERE NOT EXISTS (
    SELECT 1 FROM sment0 l
    WHERE l.path = o.path AND l.sent_id = o.sent_id AND l.s <> o.s
      AND contains(' ' || l.s || ' ', ' ' || o.s || ' '))
), subj_ok AS (
  SELECT DISTINCT tr.path, tr.sent_id, tr.depth
  FROM triples tr JOIN sment m
    ON m.path = tr.path AND m.sent_id = tr.sent_id
   AND lower(m.s) = lower(tr.arg1)
), objm AS (
  SELECT tr.path, tr.sent_id, tr.depth, m.s
  FROM triples tr JOIN sment m
    ON m.path = tr.path AND m.sent_id = tr.sent_id
   AND contains(lower(tr.arg2), lower(m.s))
), objc AS (
  SELECT path, sent_id, depth, COUNT(DISTINCT s) AS n, MIN(s) AS ent
  FROM objm GROUP BY 1, 2, 3
)
SELECT tr.sentence AS sentence, tr.arg1,
       trim(tr.rel || ' ' || replace(tr.arg2, x.new_obj, '')) AS rel,
       x.new_obj AS arg2,
       tr.conf_centi
FROM triples tr
JOIN subj_ok sk ON sk.path = tr.path AND sk.sent_id = tr.sent_id
               AND sk.depth = tr.depth
JOIN objc oc ON oc.path = tr.path AND oc.sent_id = tr.sent_id
            AND oc.depth = tr.depth AND oc.n = 1,
LATERAL (SELECT
    CASE WHEN ends_with(lower(tr.arg2), lower(oc.ent)) THEN oc.ent
         WHEN ends_with(lower(tr.arg2), lower(oc.ent) || '.')
              THEN oc.ent || '.'
         END AS new_obj) x
WHERE x.new_obj IS NOT NULL
"""
    )


def sql_carb_selfcheck() -> str:
    """The north-rule conformance expectation as a constant: the
    distributed engine's CaRB precision/recall against the single-process
    oracle MUST be exactly 1.0/1.0 — the driver now hard-fails if the
    engine's plumbing (ordering, grouping, dedup under shuffles) drifts."""
    return """
SELECT 1000::BIGINT AS precision_permille,
       1000::BIGINT AS recall_permille,
       true AS gate_095_pass
"""
