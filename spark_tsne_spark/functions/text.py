"""Text-analysis column expressions for the training-data pipeline.

All pure ``pyspark.sql.functions`` (JVM-side, codegen-friendly) and
deliberately written with DuckDB-portable semantics so every operator
has an exact SQL oracle: whitespace tokenization via regex split,
character shingles via sequence+substring, md5 as the portable hash
(lowercase hex in both engines → lexicographic min == numeric min).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tiny deterministic English stopword list shared with the SQL oracle.
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "by", "at", "from", "that", "this", "are",
)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def project_barrier(df, *exprs):
    """Materialize computed columns in their OWN whole-stage-codegen'd
    Project and fence them from CollapseProject.

    Why this exists: Spark's higher-order functions (``transform``,
    ``filter``, ...) evaluate their lambda bodies INTERPRETED, and
    CollapseProject happily inlines an upstream alias like
    ``lower(text)`` or ``split(trim(text), ...)`` into the lambda —
    after which the expensive derivation re-executes PER ARRAY
    ELEMENT instead of once per row. Measured on the sf0.1 documents
    table: the char-trigram explode inside lang-ID dropped 3.7 s →
    2.0 s with the fence (and the word-ngram explodes drop more —
    their re-inlined ``split`` is costlier than ``substring``).

    The fence is an always-true NONDETERMINISTIC filter
    (``spark_partition_id() >= 0``): row-wise a no-op, but the
    optimizer may neither push it below the Project nor collapse the
    Projects across it, so the aliases stay attributes. No shuffle,
    no caching, column pruning still reaches the scan.
    """
    return df.select(*exprs).filter(F.spark_partition_id() >= 0)


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of a trimmed string."""
    return F.split(F.trim(_col(text)), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def char_shingles(text: Column | str, k: int = 5) -> Column:
    """All character k-grams (1-based positions, DuckDB-portable).

    Strings shorter than k yield an EMPTY array. The guard matters:
    ``sequence(1, 0)`` is DESCENDING ``[1, 0]`` in Spark, so without
    it a short string emits its own prefix twice (positions 1 and 0
    both read from the front) instead of nothing.
    """
    t = _col(text)
    # zip_with over shifted char-array slices, NOT
    # transform(sequence, i -> substring(t, i, k)): HOF lambdas run
    # interpreted and re-evaluate OUTER references per element, so the
    # substring form re-derives t (and, when t is computed — e.g.
    # lower(text) — recomputes THAT) once per shingle. Here every
    # lambda touches only its own arguments; the slices evaluate once
    # per row. Measured 3.5 s -> 1.05 s on the sf0.1 trigram explode;
    # output arrays are element-identical.
    chars = F.split(t, "")
    n_sh = F.length(t) - (k - 1)
    acc = F.slice(chars, 1, n_sh)
    for i in range(1, k):
        acc = F.zip_with(
            acc, F.slice(chars, i + 1, n_sh), lambda a, b: F.concat(a, b)
        )
    return F.when(F.length(t) >= k, acc).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams_of(toks: Column, n: int = 2) -> Column:
    """Word n-grams from an ALREADY-MATERIALIZED token array.

    Use with :func:`project_barrier`: pass a fenced ``tokens(text)``
    attribute so the per-element lambda touches only the array —
    feeding ``word_ngrams`` a raw text column re-splits the document
    per n-gram once CollapseProject inlines the alias (see
    project_barrier). Same empty-array guard as word_ngrams.
    """
    n_g = F.size(toks) - (n - 1)
    acc = F.slice(toks, 1, n_g)
    for k in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(toks, k + 1, n_g),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(F.size(toks) >= n, acc).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams(text: Column | str, n: int = 2) -> Column:
    """Word n-grams joined by a single space.

    Documents with fewer than n tokens yield an EMPTY array. Without
    the guard, ``sequence(1, 0)`` emits the descending ``[1, 0]`` and
    ``slice(toks, 0, n)`` throws INVALID_PARAMETER_VALUE.START —
    crashing the whole job on one short document.
    """
    toks = tokens(text)
    # zip_with over shifted slices instead of
    # transform(sequence, i -> concat_ws(slice(toks, i, n))): the
    # interpreted HOF lambda re-evaluates outer references per
    # element, i.e. it re-SPLIT the whole document once per n-gram.
    # Lambdas here touch only their own arguments (measured 2.7 s ->
    # 0.54 s on the sf0.1 trigram explode; element-identical output).
    n_g = F.size(toks) - (n - 1)
    acc = F.slice(toks, 1, n_g)
    for k in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(toks, k + 1, n_g),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(F.size(toks) >= n, acc).otherwise(
        F.array().cast("array<string>")
    )


def stopword_ratio(text: Column | str) -> Column:
    """Fraction of tokens that are (English) stopwords — the n-gram
    language-ID heuristic's core signal."""
    toks = tokens(text)
    stops = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, F.lower(t))))
    return n_stop.cast("double") / F.greatest(F.lit(1), F.size(toks))


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are punctuation."""
    t = _col(text)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[.,!?;:()-]", ""))
    return n_punct.cast("double") / F.greatest(F.lit(1), F.length(t))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Token count under a BPE-ish regex: runs of letters, runs of
    digits, or single non-alnum-non-space characters."""
    return F.size(
        F.regexp_extract_all(_col(text), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    )


def quality_score(text: Column | str) -> Column:
    """Composite document quality in [0, 1]: rewards mid-length docs,
    low punctuation density, and a natural stopword rate."""
    t = _col(text)
    length_term = F.least(F.lit(1.0), F.length(t).cast("double") / 200.0)
    punct_term = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(t) * 5.0)
    stop_term = F.least(F.lit(1.0), stopword_ratio(t) * 4.0)
    return (length_term + punct_term + stop_term) / 3.0


# --- Character-trigram language ID ---------------------------------
#
# A real (if small) LID model: per-language character-trigram
# profiles trained at import time from the embedded sample corpus
# below, classification by argmax of the summed per-trigram profile
# weights — equivalent to cosine argmax against unit-norm profiles
# with term-frequency doc vectors, since the document norm is the
# same for every language. Weights are INTEGER parts-per-million so
# the score is an exact integer sum in any summation order — the
# same number in Spark and in the DuckDB oracle, no float drift.
#
# The sample corpus is original text written for this profile (the
# classic public-domain technique: Cavnar & Trenkle-style n-gram
# profiles); what matters is coverage of each language's function
# words and orthography, not the prose.

_LANG_SAMPLES: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and then runs into "
        "the forest where it finds that the other animals have gathered "
        "for a meeting about the coming winter this is the time of year "
        "when food is hard to find and the days are short so they plan "
        "together and share what they have because that is what good "
        "neighbours do in a small wood with one another and with all of "
        "their friends who would rather work as a group than struggle "
        "alone through the cold months of the long northern winter"
    ),
    "fr": (
        "le renard brun saute par dessus le chien et court dans la foret "
        "ou il trouve que les autres animaux se sont reunis pour une "
        "assemblee au sujet de l'hiver qui vient c'est la periode de "
        "l'annee ou la nourriture est difficile a trouver et les jours "
        "sont courts alors ils font des plans ensemble et partagent ce "
        "qu'ils ont parce que c'est ce que font les bons voisins dans un "
        "petit bois les uns avec les autres et avec tous leurs amis qui "
        "preferent travailler en groupe plutot que de lutter seuls"
    ),
    "de": (
        "der braune fuchs springt uber den faulen hund und lauft dann in "
        "den wald wo er findet dass die anderen tiere sich zu einer "
        "versammlung uber den kommenden winter getroffen haben das ist "
        "die zeit des jahres in der das essen schwer zu finden ist und "
        "die tage kurz sind also planen sie zusammen und teilen was sie "
        "haben weil gute nachbarn das in einem kleinen wald so machen "
        "miteinander und mit allen ihren freunden die lieber als gruppe "
        "arbeiten als allein durch die kalten monate zu kommen"
    ),
    "es": (
        "el zorro marron salta sobre el perro perezoso y luego corre "
        "hacia el bosque donde encuentra que los otros animales se han "
        "reunido para una asamblea sobre el invierno que viene esta es "
        "la epoca del ano en que la comida es dificil de encontrar y los "
        "dias son cortos asi que hacen planes juntos y comparten lo que "
        "tienen porque eso es lo que hacen los buenos vecinos en un "
        "bosque pequeno unos con otros y con todos sus amigos que "
        "prefieren trabajar en grupo antes que luchar solos"
    ),
    "it": (
        "la volpe marrone salta sopra il cane pigro e poi corre nella "
        "foresta dove trova che gli altri animali si sono riuniti per "
        "una assemblea sull'inverno che viene questo e il periodo "
        "dell'anno in cui il cibo e difficile da trovare e le giornate "
        "sono corte quindi fanno piani insieme e condividono quello che "
        "hanno perche questo e quello che fanno i buoni vicini in un "
        "piccolo bosco gli uni con gli altri e con tutti i loro amici "
        "che preferiscono lavorare in gruppo piuttosto che lottare soli"
    ),
    "pt": (
        "a raposa marrom pula sobre o cachorro preguicoso e depois corre "
        "para a floresta onde descobre que os outros animais se reuniram "
        "para uma assembleia sobre o inverno que vem esta e a epoca do "
        "ano em que a comida e dificil de encontrar e os dias sao curtos "
        "entao eles fazem planos juntos e compartilham o que tem porque "
        "e isso que os bons vizinhos fazem numa floresta pequena uns com "
        "os outros e com todos os seus amigos que preferem trabalhar em "
        "grupo em vez de lutar sozinhos durante os meses frios"
    ),
    "nl": (
        "de bruine vos springt over de luie hond en rent dan het bos in "
        "waar hij ontdekt dat de andere dieren zijn samengekomen voor "
        "een vergadering over de komende winter dit is de tijd van het "
        "jaar waarin voedsel moeilijk te vinden is en de dagen kort zijn "
        "dus maken ze samen plannen en delen wat ze hebben omdat goede "
        "buren dat zo doen in een klein bos met elkaar en met al hun "
        "vrienden die liever als groep werken dan alleen door de koude "
        "maanden van de lange winter te worstelen"
    ),
}

# Minimum mean per-trigram weight (ppm) for a positive call: below
# this the best language is still a poor fit and the doc is 'other'.
LANG_MIN_MEAN_WEIGHT = 400

# --- Script-range pre-classifier (non-Latin coverage) --------------
#
# The trigram profiles above only separate Latin-script languages;
# CJK/Cyrillic/Arabic/… text used to fall through to 'other'. A
# Unicode-block character census is a cheap, exact-integer
# pre-classifier: count codepoints per script class with ONE
# regexp_replace length-diff per class (JVM codegen in Spark, RE2 in
# DuckDB — the \\x{....} range syntax parses identically in both),
# then a fixed-precedence per-mille threshold CASE. Script → language
# is a documented approximation (Cyrillic → 'ru' also matches
# Ukrainian/Bulgarian etc.); kana presence is checked BEFORE Han so
# Japanese (mostly Han + ≥5% kana) doesn't read as Chinese. Both
# engines render from this single spec.

SCRIPT_RANGES: list[tuple[str, str, int, list[tuple[int, int]]]] = [
    # (lang, class, min per-mille of chars, codepoint ranges)
    ("ja", "kana", 50, [(0x3040, 0x309F), (0x30A0, 0x30FF)]),
    ("ko", "hangul", 300, [(0xAC00, 0xD7AF), (0x1100, 0x11FF)]),
    ("zh", "han", 300, [(0x4E00, 0x9FFF), (0x3400, 0x4DBF)]),
    ("ru", "cyrillic", 300, [(0x0400, 0x04FF)]),
    ("ar", "arabic", 300, [(0x0600, 0x06FF), (0x0750, 0x077F)]),
    ("el", "greek", 300, [(0x0370, 0x03FF)]),
    ("he", "hebrew", 300, [(0x0590, 0x05FF)]),
    ("hi", "devanagari", 300, [(0x0900, 0x097F)]),
    ("th", "thai", 300, [(0x0E00, 0x0E7F)]),
]


def _script_class_pattern(ranges: list[tuple[int, int]]) -> str:
    """Character-class regex over codepoint ranges, in the \\x{....}
    spelling that Java regex (Spark) and RE2 (DuckDB) share."""
    return "[" + "".join(
        "\\x{%04X}-\\x{%04X}" % (lo, hi) for lo, hi in ranges
    ) + "]"


def script_lang_case_sql(t_expr: str) -> str:
    """The pre-classifier as SQL CASE WHEN arms (no ELSE): rendered
    for DuckDB from :data:`SCRIPT_RANGES` so the oracle and the Spark
    expression share one spec. ``t_expr`` names the (lowered) text."""
    arms = []
    for lang, _cls, permille, ranges in SCRIPT_RANGES:
        pat = _script_class_pattern(ranges)
        cnt = (
            f"(length({t_expr}) - "
            f"length(regexp_replace({t_expr}, '{pat}', '', 'g')))"
        )
        arms.append(
            f"WHEN {cnt} > 0 AND {cnt} * 1000 >= length({t_expr}) * {permille} "
            f"THEN '{lang}'"
        )
    return "\n          ".join(arms)


def _trigram_profile(sample: str, top: int = 300) -> dict[str, int]:
    """Integer-ppm trigram frequency profile of a training sample."""
    from collections import Counter

    s = " " + " ".join(sample.lower().split()) + " "
    counts = Counter(s[i : i + 3] for i in range(len(s) - 2))
    total = sum(counts.values())
    prof = {}
    for g, c in counts.most_common(top):
        w = round(1_000_000 * c / total)
        if w > 0:
            prof[g] = w
    return prof


LANG_TRIGRAM_PROFILES: dict[str, dict[str, int]] = {
    lang: _trigram_profile(s) for lang, s in sorted(_LANG_SAMPLES.items())
}


def _lang_weight_map() -> Column:
    """All profiles as ONE nested literal map: first-char →
    (trigram → array of per-language weights, language order =
    ``sorted(LANG_TRIGRAM_PROFILES)``).

    Shape matters for speed: Spark's ``GetMapValue`` on a literal map
    is a linear key scan, so one flat (trigram → …) map of ~1.2k union
    keys costs ~1.2k string compares per text trigram. Bucketing by
    first character makes each lookup an outer scan over ~25 chars
    plus an inner scan over ~50 trigrams — ~20× fewer compares, still
    pure JVM expressions, still exact integer arithmetic.

    Construction matters too: building this from ~2.4k ``F.lit``
    Column objects costs >10s of py4j round-trips PER QUERY BUILD;
    rendering it as one SQL literal and crossing the bridge with a
    single ``F.expr`` call is ~three orders of magnitude cheaper, so
    that is what we do (the rendered string is cached; the Column is
    rebuilt per call so nothing outlives a SparkSession).
    """
    return F.expr(_lang_weight_map_sql())


def _lang_weight_map_sql() -> str:
    global _LANG_MAP_SQL
    if _LANG_MAP_SQL is not None:
        return _LANG_MAP_SQL

    def q(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    langs = sorted(LANG_TRIGRAM_PROFILES)
    union: dict[str, list[int]] = {}
    for li, lang in enumerate(langs):
        for g, w in LANG_TRIGRAM_PROFILES[lang].items():
            union.setdefault(g, [0] * len(langs))[li] = w
    by_first: dict[str, dict[str, list[int]]] = {}
    for g, ws in union.items():
        by_first.setdefault(g[0], {})[g] = ws
    outer = []
    for c in sorted(by_first):
        inner = []
        for g in sorted(by_first[c]):
            ws = ", ".join(f"{w}L" for w in by_first[c][g])
            inner.append(f"{q(g)}, array({ws})")
        outer.append(f"{q(c)}, map({', '.join(inner)})")
    _LANG_MAP_SQL = f"map({', '.join(outer)})"
    return _LANG_MAP_SQL


_LANG_MAP_SQL: str | None = None


def lang_id(text: Column | str) -> Column:
    """Char-trigram language ID over ``LANG_TRIGRAM_PROFILES``.

    One narrow pass, no shuffle, no UDF: a SINGLE ``F.aggregate`` over
    the text's trigrams folds an ``array<long>`` accumulator of
    ``[score_lang0, …, score_langN, trigram_count]`` — one nested
    map-literal lookup per trigram (see :func:`_lang_weight_map`) —
    and the ``finish`` lambda does the argmax (lexicographic
    tie-break) and the ``LANG_MIN_MEAN_WEIGHT`` fit threshold inside
    the same expression, so the whole classification is evaluated
    exactly once per row (higher-order functions are interpreted, not
    codegen'd — re-referencing per-language aggregates from an outer
    when-chain re-evaluates them; the r3 shape re-ran the fold per
    language). Measured cost of ONE evaluation: ~1.7 ms per 1 KB doc
    per core (the literal-map lookup is a linear key scan per
    trigram) — linear and narrow, but 5-10x the other text signals;
    avoid re-referencing it from filters (each pushed-down reference
    re-evaluates), and prefer the table's stored lang column when one
    exists. Exact-arithmetic twin of the DuckDB oracle (integer sums
    are order-independent).
    """
    langs = sorted(LANG_TRIGRAM_PROFILES)
    nl = len(langs)
    wmap = _lang_weight_map()
    zeros = F.array(*[F.lit(0).cast("long") for _ in range(nl)])
    acc0 = F.array(*[F.lit(0).cast("long") for _ in range(nl + 1)])
    one = F.array(F.lit(1).cast("long"))

    def merge(acc: Column, g: Column) -> Column:
        ws = F.coalesce(wmap[F.substring(g, 1, 1)][g], zeros)
        return F.zip_with(acc, F.concat(ws, one), lambda a, b: a + b)

    def finish(acc: Column) -> Column:
        n = F.element_at(acc, nl + 1)
        scores = [F.element_at(acc, i + 1) for i in range(nl)]
        best = F.greatest(*scores)
        pred = F.lit("other")
        for i in reversed(range(nl)):  # build so FIRST lang wins ties
            pred = F.when(scores[i] == best, F.lit(langs[i])).otherwise(pred)
        return F.when(
            (n > 0) & (best >= F.lit(LANG_MIN_MEAN_WEIGHT) * n), pred
        ).otherwise(F.lit("other"))

    t = F.lower(_col(text))
    grams = char_shingles(t, 3)
    trigram_pred = F.coalesce(
        F.aggregate(grams, acc0, merge, finish), F.lit("other")
    )
    # Script-range pre-classifier (see SCRIPT_RANGES): non-Latin
    # scripts are decided by a codepoint census BEFORE the Latin
    # trigram argmax; CASE arms evaluate in spec order so kana
    # precedes Han. The regexp length-diffs are plain JVM codegen —
    # on ASCII text every census is 0 and the row falls through.
    n = F.length(t)
    pred = trigram_pred
    for lang, _cls, permille, ranges in reversed(SCRIPT_RANGES):
        pat = _script_class_pattern(ranges)
        cnt = n - F.length(F.regexp_replace(t, pat, ""))
        pred = F.when(
            (cnt > 0) & (cnt * 1000 >= n * permille), F.lit(lang)
        ).otherwise(pred)
    return pred


def multiplicity_stats(arr: Column) -> Column:
    """Duplicate-multiplicity stats of a string array in ONE narrow
    pass: ``struct(n, top, dup)`` where ``n`` = element count,
    ``top`` = the highest multiplicity of any value, and ``dup`` = how
    many elements belong to values occurring ≥ 2 times.

    Shape: ``sort_array`` groups equal values contiguously, then a
    single ``F.aggregate`` fold tracks (previous value, current run,
    best run, dup count) — O(L log L) per row, JVM-side, NO shuffle.
    The obvious alternative (explode → groupBy(doc, value) → groupBy
    (doc)) shuffles the whole token stream twice; this never leaves
    the row. Equivalent to the SQL ``count(*) GROUP BY value`` stats:
    ``top = max(c)``, ``dup = sum(c) FILTER (c >= 2)`` — which is
    exactly how the DuckDB oracle states it.
    """
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("n"),
    )

    def merge(acc: Column, x: Column) -> Column:
        same = F.coalesce(x == acc["prev"], F.lit(False))
        run = F.when(same, acc["run"] + F.lit(1).cast("long")).otherwise(
            F.lit(1).cast("long")
        )
        # a value's 2nd occurrence retroactively counts the 1st too
        dup_inc = (
            F.when(~same, F.lit(0))
            .when(acc["run"] == 1, F.lit(2))
            .otherwise(F.lit(1))
            .cast("long")
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            (acc["dup"] + dup_inc).alias("dup"),
            (acc["n"] + F.lit(1).cast("long")).alias("n"),
        )

    def finish(acc: Column) -> Column:
        return F.struct(
            acc["n"].alias("n"), acc["best"].alias("top"), acc["dup"].alias("dup")
        )

    return F.aggregate(F.sort_array(arr), zero, merge, finish)


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lowercased text."""
    return F.md5(F.lower(F.regexp_replace(F.trim(_col(text)), r"\s+", " ")))


# Unicode cleanup rules, applied in order — ONE spec rendered as both
# the Spark expression chain (normalize_text) and the DuckDB oracle
# chain (normalize_text_sql). Patterns stay inside the regex subset
# Java regex and RE2 share (literal chars + char classes + bounded
# quantifiers; no lookaround, no backrefs).
NORMALIZE_RULES: list[tuple[str, str]] = [
    # line-ending unification FIRST: CRLF and bare CR -> LF, so CRLF
    # documents hit the whitespace-collapse and blank-line-cap rules
    # below and no \r survives to the output
    ("\\r\\n?", "\n"),
    # C0/C1-ish control chars except \t \n (DEL included; \r already
    # rewritten to \n by the rule above)
    ("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
    # exotic spaces -> plain space (NBSP, en/em/thin/zw, narrow
    # no-break, ideographic)
    ("[  -​ 　]", " "),
    # curly single quotes -> apostrophe
    ("[‘’‚‛]", "'"),
    # curly double quotes -> straight quote
    ("[“”„‟]", '"'),
    # hyphen/dash family + minus sign -> ASCII hyphen
    ("[‐-―−]", "-"),
    # ellipsis -> three dots
    ("…", "..."),
    # collapse horizontal whitespace runs
    ("[ \\t]+", " "),
    # strip spaces around newlines, then cap blank-line runs at one
    (" ?\\n ?", "\n"),
    ("\\n{3,}", "\n\n"),
]


def normalize_text(text: Column | str) -> Column:
    """Unicode text normalization for corpus curation: control-char
    strip, space/quote/dash unification, whitespace collapse — the
    standard pre-tokenization cleanup pass. Pure JVM regexp chain
    (whole-stage codegen, no Python); same :data:`NORMALIZE_RULES`
    spec as the DuckDB oracle rendering."""
    c = _col(text)
    for pat, repl in NORMALIZE_RULES:
        c = F.regexp_replace(c, pat, repl)
    return F.trim(c)


def normalize_text_sql(expr: str) -> str:
    """DuckDB rendering of :data:`NORMALIZE_RULES` over ``expr``."""

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    out = expr
    for pat, repl in NORMALIZE_RULES:
        out = f"regexp_replace({out}, {q(pat)}, {q(repl)}, 'g')"
    return f"trim({out})"


def shingle_hashes(text: Column | str, k: int = 5) -> Column:
    """md5 of every character k-gram (DuckDB-portable hash order)."""
    return F.transform(char_shingles(_col(text), k), lambda s: F.md5(s))


def winnow_from_hashes(hashes: Column, window: int = 4) -> Column:
    """Sliding-window minimum over a shingle-hash array: the winnowing
    core, as a zip_with chain over ``window`` shifted slices
    (O(window * L) per row).

    Pass ``hashes`` as a *named column* materialized in its own
    projection (see ``text_winnow_fingerprints``): referencing a
    non-cheap alias several times keeps Catalyst's CollapseProject
    from inlining it, so the md5 pass runs once per row. Handing an
    inline ``transform(...)`` expression here re-evaluates it per
    slice instead. Assumes ``size(hashes) >= window`` (filter shorter
    docs out first — winnowing makes no promise about them anyway).
    """
    n_out = F.size(hashes) - (window - 1)
    mins = F.slice(hashes, 1, n_out)
    for off in range(1, window):
        mins = F.zip_with(
            mins, F.slice(hashes, off + 1, n_out), lambda a, b: F.least(a, b)
        )
    return F.array_distinct(mins)


def winnow_fingerprints(
    text: Column | str, k: int = 5, window: int = 4
) -> Column:
    """Winnowing fingerprint set (Schleimer et al. 2003, the MOSS
    scheme): hash every character k-gram, keep the minimum hash of
    each ``window`` of consecutive shingles, distinct.

    Guarantees any shared substring of length ≥ k + window − 1
    contributes at least one common fingerprint to both documents —
    the positional robustness whole-document hashing lacks. Documents
    shorter than the guarantee threshold emit no fingerprints (the
    scheme makes no promise about them). Fully declarative (one
    ``transform`` over a shingle array) and DuckDB-portable via the
    lowercase-hex md5 ordering, like ``minhash_values``.
    """
    t = _col(text)
    hashes = shingle_hashes(t, k)
    # Single-expression form: the inline hash array is re-evaluated
    # once per shifted slice (constant `window` factor). Length-based
    # arithmetic for the slice width avoids `size(hashes)` re-running
    # the md5 transform another `window` times. For the one-per-row
    # evaluation, materialize shingle_hashes() in its own projection
    # and call winnow_from_hashes (what the catalog query does).
    n_out = F.length(t) - (k - 1) - (window - 1)
    mins = F.slice(hashes, 1, n_out)
    for off in range(1, window):
        mins = F.zip_with(
            mins, F.slice(hashes, off + 1, n_out), lambda a, b: F.least(a, b)
        )
    return F.when(F.length(t) >= k + window - 1, F.array_distinct(mins)).otherwise(
        F.array().cast("array<string>")
    )


def minhash_values(
    text: Column | str,
    num_hashes: int = 16,
    shingle_k: int = 5,
    hash_fn: str = "md5",
) -> Column:
    """MinHash signature as an array of ``num_hashes`` minima.

    ``hash_fn='md5'``: portable construction — h_i(s) = md5(i || ':' || s),
    lowercase fixed-width hex ⇒ string min == numeric min in both Spark
    and DuckDB (the oracle path).
    ``hash_fn='xxhash64'``: production path — h_i(s) = xxhash64(s, seed=i),
    one 64-bit hash per shingle per row of the signature (~10× cheaper
    than md5; same banding semantics, not DuckDB-portable).
    """
    sh = char_shingles(text, shingle_k)
    if hash_fn == "xxhash64":
        # h_i(s) = xxhash64(s, i): each shingle is hashed once per
        # signature row inside ONE transform (the shingle array is
        # built once), then the per-shingle hash vectors fold into
        # elementwise minima. NB a two-parameter lambda in F.transform
        # would receive the array POSITION as its second argument —
        # the seed must come from the Python loop, not a lambda param.
        per_shingle = F.transform(
            sh,
            lambda s: F.array(*[F.xxhash64(s, F.lit(i)) for i in range(num_hashes)]),
        )
        folded = F.aggregate(
            per_shingle,
            F.array_repeat(F.lit(2**63 - 1), num_hashes),
            lambda acc, x: F.zip_with(acc, x, lambda a, b: F.least(a, b)),
        )
        return F.transform(folded, lambda v: v.cast("string"))
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))))
            for i in range(num_hashes)
        ]
    )


# PII patterns in the common Java-regex / RE2 subset (no lookaround,
# no backrefs) so Spark and the DuckDB oracle scrub identically.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+?[0-9][0-9. ()-]{7,}[0-9]",
}
PII_ORDER = ("email", "ipv4", "phone")  # email first: contains digits


def scrub_pii(text: Column | str) -> Column:
    """Redact PII spans with ``<TYPE>`` placeholders (email, IPv4,
    phone-like digit runs), applied in a fixed order so placeholders
    never re-match a later pattern. One JVM regexp pass per pattern —
    a narrow projection, no Python."""
    out = _col(text)
    for name in PII_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[name], f"<{name.upper()}>")
    return out


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-type PII match counts (same patterns/order semantics as
    :func:`scrub_pii`, counted on the progressively-scrubbed text so
    types never double-count each other's spans)."""
    cur = _col(text)
    counts = {}
    for name in PII_ORDER:
        counts[name] = F.size(F.regexp_extract_all(cur, F.lit(PII_PATTERNS[name]), 0))
        cur = F.regexp_replace(cur, PII_PATTERNS[name], f"<{name.upper()}>")
    return counts


def char_entropy(text: Column | str) -> Column:
    """Shannon entropy (bits/char) of the ASCII character
    distribution — the CCNet-style "is this natural text or
    boilerplate/noise" signal (low → repetitive filler, ~4.2 → English
    prose, ~6+ → random bytes).

    ONE narrow pass, no shuffle: ``sort_array`` groups equal chars
    contiguously, a single ``F.aggregate`` fold accumulates
    Σ cᵢ·log2(cᵢ) run by run (the :func:`multiplicity_stats` shape),
    and the finish lambda closes the last run and applies
    ``H = log2(N) − Σ cᵢ·log2(cᵢ)/N``. The relational alternative
    (explode chars → two groupBys) shuffles the entire character
    stream — this never leaves the row.
    """
    t = F.regexp_replace(_col(text), r"[^\x00-\x7F]", "")
    n = F.length(t)
    chars = F.sort_array(
        F.when(
            n > 0,
            F.transform(
                F.sequence(F.lit(1), n), lambda i: F.substring(t, i, 1)
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0.0).alias("s"),
    )

    def merge(acc: Column, x: Column) -> Column:
        same = F.coalesce(x == acc["prev"], F.lit(False))
        flush = F.when(
            ~same & (acc["run"] > 0),
            acc["run"].cast("double") * F.log2(acc["run"].cast("double")),
        ).otherwise(F.lit(0.0))
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + F.lit(1).cast("long"))
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            (acc["s"] + flush).alias("s"),
        )

    def finish(acc: Column) -> Column:
        s = acc["s"] + F.when(
            acc["run"] > 0,
            acc["run"].cast("double") * F.log2(acc["run"].cast("double")),
        ).otherwise(F.lit(0.0))
        return s

    s_total = F.aggregate(chars, zero, merge, finish)
    return F.when(
        n > 0, F.log2(n.cast("double")) - s_total / n.cast("double")
    ).otherwise(F.lit(0.0))


# --- Char-trigram LM scoring (CCNet-style quality signal) -----------
#
# Documents are scored under the English trigram profile as a tiny
# character language model: avg log2 P(gram), with unseen grams
# floored at 1 ppm. Per-gram log values are precomputed as INTEGER
# centibits (round(100*log2(w/1e6))) so the per-document sum is exact
# integer arithmetic — the same number in Spark and the DuckDB oracle
# in any summation order, like the LID scores.

LM_UNSEEN_CENTIBITS = -1993  # round(100 * log2(1e-6))


def _lm_centibit_table(lang: str = "en") -> dict[str, int]:
    import math

    return {
        g: round(100 * math.log2(w / 1_000_000))
        for g, w in LANG_TRIGRAM_PROFILES[lang].items()
    }


_LM_MAP_SQL: dict[str, str] = {}


def _lm_centibit_map_sql(lang: str = "en") -> str:
    """The centibit table as ONE first-char-bucketed SQL map literal
    (same shape + rationale as :func:`_lang_weight_map_sql`)."""
    if lang in _LM_MAP_SQL:
        return _LM_MAP_SQL[lang]

    def q(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    by_first: dict[str, dict[str, int]] = {}
    for g, cb in _lm_centibit_table(lang).items():
        by_first.setdefault(g[0], {})[g] = cb
    outer = []
    for c in sorted(by_first):
        inner = ", ".join(
            f"{q(g)}, {by_first[c][g]}L" for g in sorted(by_first[c])
        )
        outer.append(f"{q(c)}, map({inner})")
    _LM_MAP_SQL[lang] = f"map({', '.join(outer)})"
    return _LM_MAP_SQL[lang]


def lm_trigram_score(text: Column | str, lang: str = "en") -> Column:
    """``struct(n_grams, cb_sum)``: trigram count and total integer
    centibits of log2-probability under the ``lang`` profile — one
    narrow ``F.aggregate`` pass, no shuffle, no UDF. Callers derive
    ``avg_bits = cb_sum / (100 * n_grams)`` (≈ −20 for random bytes,
    ≈ −9 to −12 for natural English — the CCNet-style filter signal).
    """
    wmap = F.expr(_lm_centibit_map_sql(lang))
    grams = char_shingles(F.lower(_col(text)), 3)
    zero = F.struct(
        F.lit(0).cast("long").alias("n"), F.lit(0).cast("long").alias("s")
    )

    def merge(acc: Column, g: Column) -> Column:
        cb = F.coalesce(
            wmap[F.substring(g, 1, 1)][g], F.lit(LM_UNSEEN_CENTIBITS).cast("long")
        )
        return F.struct(
            (acc["n"] + 1).cast("long").alias("n"),
            (acc["s"] + cb).cast("long").alias("s"),
        )

    def finish(acc: Column) -> Column:
        return F.struct(acc["n"].alias("n_grams"), acc["s"].alias("cb_sum"))

    return F.aggregate(grams, zero, merge, finish)
