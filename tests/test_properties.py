"""Property-based tests (hypothesis) over the pure driver-side components:
EDMX parsing, type mapping, control store, OData URL/filter building.
No SparkSession — these run in milliseconds per example."""

import os

from hypothesis import given, settings
from hypothesis import strategies as st

from priority_data_pipeline_postgres_db_spark.functions.typemap import entity_struct
from priority_data_pipeline_postgres_db_spark.sources.control import ControlStore
from priority_data_pipeline_postgres_db_spark.sources.metadata import parse_edmx, to_struct
from priority_data_pipeline_postgres_db_spark.sources.odata import build_url, filters_to_odata
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, IsNull

IDENT = st.from_regex(r"[A-Z][A-Z0-9_]{0,14}", fullmatch=True)
EDM_TYPES = st.sampled_from(["Edm.String", "Edm.Decimal", "Edm.DateTimeOffset", "Edm.Int64"])


@st.composite
def entity_defs(draw):
    n_fields = draw(st.integers(1, 8))
    names = draw(
        st.lists(IDENT, min_size=n_fields, max_size=n_fields, unique=True)
    )
    types = [draw(EDM_TYPES) for _ in range(n_fields)]
    n_keys = draw(st.integers(0, min(2, n_fields)))
    return {"name": draw(IDENT), "fields": list(zip(names, types)), "keys": names[:n_keys]}


def render_edmx(entities: list[dict]) -> str:
    parts = [
        '<edmx:Edmx xmlns:edmx="http://docs.oasis-open.org/odata/ns/edmx" Version="4.0">',
        '<edmx:DataServices><Schema xmlns="http://docs.oasis-open.org/odata/ns/edm">',
    ]
    for e in entities:
        parts.append(f'<EntityType Name="{e["name"]}">')
        if e["keys"]:
            parts.append(
                "<Key>" + "".join(f'<PropertyRef Name="{k}"/>' for k in e["keys"]) + "</Key>"
            )
        for fname, ftype in e["fields"]:
            parts.append(f'<Property Name="{fname}" Type="{ftype}"/>')
        parts.append("</EntityType>")
    parts.append("</Schema></edmx:DataServices></edmx:Edmx>")
    return "".join(parts)


@settings(max_examples=50, deadline=None)
@given(st.lists(entity_defs(), min_size=1, max_size=4))
def test_edmx_roundtrip_properties(entities):
    # entity names may repeat across draws; keep first occurrence semantics
    docs = parse_edmx(render_edmx(entities))
    assert len(docs) == len(entities)
    for e, doc in zip(entities, docs):
        assert doc["_id"] == e["name"]
        assert [f["fieldName"] for f in doc["Fields"]] == [n for n, _ in e["fields"]]
        assert doc["EntityPk"] == e["keys"]
        # every key field flagged, every non-key not
        for f in doc["Fields"]:
            assert f["KeyFlag"] == (f["fieldName"] in e["keys"])
        # struct invariants: PKs become non-nullable strings, audit cols last
        struct = to_struct(doc)
        assert struct.fieldNames()[-2:] == ["extractionid", "extractiontimestamputc"]
        for f in struct.fields[:-2]:
            src = next(x for x in doc["Fields"] if x["fieldName"].lower() == f.name)
            if src["KeyFlag"]:
                assert f.dataType.simpleString() == "string" and not f.nullable


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(IDENT, st.sampled_from(["Edm.String", "Edm.Int64", "Edm.Decimal", "Edm.Unknown"]), st.booleans()),
        min_size=1,
        max_size=10,
        unique_by=lambda t: t[0],
    )
)
def test_entity_struct_total(fields):
    st_fields = [
        {"fieldName": n, "SourceDataType": t, "KeyFlag": k} for n, t, k in fields
    ]
    struct = entity_struct(st_fields, with_audit=False)
    assert len(struct.fields) == len(fields)
    for (n, t, k), f in zip(fields, struct.fields):
        assert f.name == n.lower()
        if k or t in ("Edm.String", "Edm.Unknown"):
            assert f.dataType.simpleString() == "string"  # PK coercion / degrade


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(0, 10**6), min_size=1, max_size=6),
    st.integers(0, 5),
)
def test_control_store_latest_wins(seq, n_updates):
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        store = ControlStore(os.path.join(d, "c.json"))
        base = {
            "datasourceName": "x",
            "uri": "u://",
            "accountID": "a",
            "systemTimezone": "UTC",
            "sourceSystem": "priority",
            "entities": [
                {
                    "EntityID": "E1",
                    "filterFlag": False,
                    "filterField": "",
                    "expand": [],
                    "lastRun": "2024-01-01 00:00:00",
                    "dataStartDate": "2024-01-01 00:00:00",
                }
            ],
        }
        for i, tag in enumerate(seq):
            store.insert_config(dict(base, datasourceName=f"v{i}-{tag}"), datasource_id="ds")
        got = store.latest_config("ds")
        assert got["datasourceName"] == f"v{len(seq)-1}-{seq[-1]}"
        for j in range(n_updates):
            store.update_last_run("ds", "E1", value=f"2024-02-{j+1:02d} 00:00:00")
        if n_updates:
            reloaded = ControlStore(store.path)
            assert (
                reloaded.latest_config("ds")["entities"][0]["lastRun"]
                == f"2024-02-{n_updates:02d} 00:00:00"
            )


@settings(max_examples=50, deadline=None)
@given(IDENT, st.lists(IDENT, max_size=3, unique=True), st.integers(0, 1000), st.integers(1, 1000))
def test_build_url_structure(entity, expand, skip, top):
    url = build_url("https://h/o/", entity, expand=expand or None, skip=skip, top=top)
    assert url.startswith(f"https://h/o/{entity}")
    assert f"$skip={skip}" in url and f"$top={top}" in url
    for e in expand:
        assert f"{e}_SUBFORM" in url
    # qs separators well-formed: exactly one '?', params '&'-joined
    assert url.count("?") == 1
    assert "??" not in url and "&&" not in url


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(IDENT, st.integers(0, 10**9)), max_size=5))
def test_filters_to_odata_partition(pairs):
    filters = []
    for name, v in pairs:
        filters.append(GreaterThanOrEqual((name.lower(),), v))
        filters.append(IsNull((name.lower(),)))
    field_map = {name.lower(): name for name, _ in pairs}
    clause, unsupported = filters_to_odata(filters, field_map)
    # every filter either translated or returned — none dropped
    assert len(unsupported) + (clause.count(" ge ") if clause else 0) == len(filters)
    # IsNull is never translatable
    assert sum(isinstance(f, IsNull) for f in unsupported) == len(pairs)


# ---------------------------------------------------------------------------
# cross-engine hash portability (the md5-60 contract every oracle-checked
# LSH / split operator rests on)
# ---------------------------------------------------------------------------

import duckdb as _duckdb

from priority_data_pipeline_postgres_db_spark.operators.dedup import _md5_60

_DUCK = _duckdb.connect()


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60))
def test_md5_60_matches_duckdb(s):
    """Python int(md5[:15],16) == DuckDB ('0x'||substr(md5,1,15))::BIGINT
    for arbitrary printable strings — the exact expression the minhash/
    simhash/split oracles inline."""
    got = _DUCK.execute(
        "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [s]
    ).fetchone()[0]
    assert got == _md5_60(s)
    assert 0 <= got < 1 << 60


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=-(10**12), max_value=10**12))
def test_hash_split_bucket_matches_duckdb(doc_id):
    """The JVM-side bucket expression's semantics (md5 of the key's string
    form, 60-bit prefix, mod 100) — DuckDB and Python agree; Spark-vs-
    DuckDB equality is pinned by the corpus_hash_split oracle."""
    got = _DUCK.execute(
        "SELECT ('0x' || substr(md5(CAST(? AS VARCHAR)), 1, 15))::BIGINT % 100",
        [doc_id],
    ).fetchone()[0]
    assert got == _md5_60(str(doc_id)) % 100


@given(
    n=st.integers(min_value=1, max_value=200),
    size=st.integers(min_value=2, max_value=64),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
@settings(max_examples=30, deadline=None)
def test_chunk_count_formula_covers_every_token(n, size, overlap_frac):
    """Driver-side model of chunk_documents' chunk-count expression: for
    any (n, size, stride) the windows [c*stride, c*stride+size) cover
    [0, n) with no gap, and the formula never emits an empty chunk."""
    stride = max(1, int(size * (1 - overlap_frac)))
    n_chunks = 1 if n <= size else (n - size + stride - 1) // stride + 1
    covered = set()
    for c in range(n_chunks):
        lo = c * stride
        assert lo < n  # no empty chunk
        covered.update(range(lo, min(lo + size, n)))
    assert covered == set(range(n))


# ---------------------------------------------------------------------------
# pure media-codec properties (stdlib PNG path + perceptual hash)
# ---------------------------------------------------------------------------

import numpy as np

from priority_data_pipeline_postgres_db_spark.operators.multimodal import (
    _png_pixels,
    dhash64,
    encode_png,
    perturb_png,
)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(8, 40),
    st.integers(8, 40),
    st.sampled_from([1, 3]),
    st.integers(0, 2**31 - 1),
)
def test_png_encode_decode_roundtrip(h, w, ch, seed):
    """encode_png/_png_pixels are exact inverses for any 8-bit array."""
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, (h, w, ch), dtype=np.uint8)
    out = _png_pixels(encode_png(arr))
    assert out is not None and out.shape == (h, w, ch)
    assert (out == arr).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(16, 48), st.integers(16, 48), st.integers(0, 2**31 - 1))
def test_dhash_single_pixel_edit_bounded(h, w, seed):
    """A one-pixel edit touches one block of the 8×9 grid, which appears
    in at most two gradient comparisons — so Hamming ≤ 2 on ANY image,
    structurally (the property the banded-join recall bound relies on)."""
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    img = encode_png(arr)
    d = bin((dhash64(img) ^ dhash64(perturb_png(img))) & (2**64 - 1)).count("1")
    assert d <= 2
    assert dhash64(img) == dhash64(img)  # pure function


# --------------------------------------------------------------------------
# r7: Bloom-filter bit math (operators.corpus) — no SparkSession needed
# --------------------------------------------------------------------------


@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=400,
    )
)
@settings(max_examples=60, deadline=None)
def test_bloom_never_false_negative(keys):
    """Every inserted key tests positive, for arbitrary int64 keys
    (including extremes and duplicates) — the property decontaminate_bloom
    relies on to answer to the same oracle as the plain operator."""
    import numpy as np

    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        _BLOOM_K,
        _bloom_build,
        _bloom_hash_halves,
    )

    arr = np.array(keys, dtype=np.int64)
    bits, mask = _bloom_build(arr)
    h1, h2 = _bloom_hash_halves(arr, mask)
    out = np.ones(len(arr), dtype=bool)
    for i in range(_BLOOM_K):
        idx = (h1 + np.uint64(i) * h2) & np.uint64(mask)
        out &= (
            bits[(idx >> np.uint64(3)).astype(np.int64)]
            & (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
        ) != 0
    assert out.all()


# --------------------------------------------------------------------------
# r7: AllPairs prefix-filter theorem (operators.dedup) — pure set math
# --------------------------------------------------------------------------


@given(
    st.lists(
        st.lists(st.integers(0, 40), min_size=1, max_size=20),
        min_size=2,
        max_size=12,
    )
)
@settings(max_examples=120, deadline=None)
def test_prefix_theorem_no_false_negatives(corpus):
    """For ANY corpus, any pair with Jaccard >= 3/5 shares at least one
    token inside both members' (|s| - ceil(0.6|s|) + 1)-prefixes under
    the ascending-document-frequency total order — the guarantee that
    makes dedup_jaccard_prefix's pruning lossless."""
    from collections import Counter
    from itertools import combinations

    sets = [frozenset(doc) for doc in corpus]
    df = Counter(t for s in sets for t in s)
    order = lambda t: (df[t], t)  # noqa: E731 — global total order

    def prefix(s):
        n = len(s)
        L = n - (3 * n + 4) // 5 + 1
        return set(sorted(s, key=order)[:L])

    for a, b in combinations(sets, 2):
        inter, uni = len(a & b), len(a | b)
        if uni and 5 * inter >= 3 * uni:
            assert prefix(a) & prefix(b), (sorted(a), sorted(b))
