"""Directory-source face: binaryFile listing, glob pushdown, extension
routing, and payload parsing through the multimodal operators."""

from __future__ import annotations

import pandas as pd

from ocr_spark.operators import multimodal
from ocr_spark.sources import binary_dir_source, listed_payloads, route_by_extension


def _write_files(d):
    (d / "sub").mkdir()
    files = {
        "a.png": multimodal.encode_fake_image(1, 4, 3),
        "b.PDF": b"%PDF-1.4 fake",
        "sub/c.jpeg": multimodal.encode_fake_image(2, 2, 2),
        "notes.txt": b"not a payload",
    }
    for name, content in files.items():
        (d / name).write_bytes(content)
    return files


def test_binary_dir_source_lists_recursively_with_bytes(spark, tmp_path):
    files = _write_files(tmp_path)
    out = binary_dir_source(spark, str(tmp_path)).toPandas()
    assert len(out) == len(files)
    by_name = {p.rsplit("/", 1)[-1]: c for p, c in zip(out["path"], out["content"])}
    assert bytes(by_name["a.png"]) == files["a.png"]
    assert bytes(by_name["c.jpeg"]) == files["sub/c.jpeg"]
    assert (out["length"] > 0).all()


def test_glob_filter_pushes_into_listing(spark, tmp_path):
    _write_files(tmp_path)
    out = binary_dir_source(spark, str(tmp_path), glob="*.png").toPandas()
    assert len(out) == 1 and out["path"].iloc[0].endswith("a.png")


def test_extension_routing_matches_reference_whitelist(spark, tmp_path):
    _write_files(tmp_path)
    routed = route_by_extension(binary_dir_source(spark, str(tmp_path))).toPandas()
    routes = {
        p.rsplit("/", 1)[-1]: r for p, r in zip(routed["path"], routed["route"])
    }
    # case-insensitive, like the reference's .lower().endswith dispatch
    assert routes["a.png"] == "image"
    assert routes["b.PDF"] == "pdf"
    assert routes["c.jpeg"] == "image"
    assert routes["notes.txt"] == "unsupported"


def test_listed_payloads_feed_multimodal_operators(spark, tmp_path):
    _write_files(tmp_path)
    payloads = listed_payloads(spark, str(tmp_path)).filter("route = 'image'")
    with_ids = payloads.selectExpr(
        "CAST(length AS LONG) AS vec_id", "content AS payload"
    )
    meta = multimodal.extract_metadata(with_ids).toPandas()
    assert len(meta) == 2
    assert meta["valid"].all()
    assert set(zip(meta["width"], meta["height"])) == {(4, 3), (2, 2)}


def test_pdf_job_cli_end_to_end(spark, tmp_path):
    # the PDF front-door CLI: directory of real PDFs (plus one corrupt
    # file and one non-pdf) → parquet of per-page text + JSON summary
    import json

    import pdf_job
    from ocr_spark.kernels.pdf import build_pdf

    d = tmp_path / "pdfs"
    d.mkdir()
    (d / "a.pdf").write_bytes(build_pdf(["page one text", "page two text"]))
    (d / "b.PDF").write_bytes(build_pdf(["solo"]))  # case-insensitive route
    (d / "broken.pdf").write_bytes(b"%PDF-1.4 truncated garbage")
    (d / "ignore.txt").write_bytes(b"not routed")

    out = tmp_path / "out"
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = pdf_job.main(
            ["--input-dir", str(d), "--output", str(out)]
        )
    assert rc == 0
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert summary["files"] == 3  # both .pdf cases + broken; txt not routed
    assert summary["parsed"] == 2 and summary["skipped"] == 1
    assert summary["pages"] == 3

    got = (
        spark.read.parquet(str(out))
        .toPandas()
        .sort_values(["path", "page_idx"], ignore_index=True)
    )
    assert got["page_text"].tolist() == ["page one text", "page two text", "solo"]
    assert got["page_idx"].tolist() == [1, 2, 1]


def test_pdf_job_page_range(spark, tmp_path):
    import json

    import pdf_job
    from ocr_spark.kernels.pdf import build_pdf

    d = tmp_path / "pdfs"
    d.mkdir()
    (d / "x.pdf").write_bytes(build_pdf([f"p{i}" for i in range(1, 6)]))
    out = tmp_path / "out"
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pdf_job.main(
            [
                "--input-dir", str(d), "--output", str(out),
                "--start-page", "2", "--end-page", "99",  # end clamps
            ]
        )
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert summary["pages"] == 4
    got = spark.read.parquet(str(out)).toPandas().sort_values("page_idx")
    assert got["page_text"].tolist() == ["p2", "p3", "p4", "p5"]


def test_orc_roundtrip_recovers_everything(spark):
    import pandas as pd

    from ocr_spark import sources

    pdf = pd.DataFrame(
        {
            "doc_id": [5, 37, 69, 1],          # 5/37/69 share shard 5
            "text": ["plain", "üñíçødé 数据 π", "", "tab\tand\nnewline"],
            "lang": ["en", "de", "en", "fr"],
            "source": ["web", "web", "books", "web"],
        }
    )
    out = (
        sources.orc_roundtrip(spark.createDataFrame(pdf), shards=32)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(out) == 4
    for _, r in pdf.iterrows():
        row = out.loc[r.doc_id]
        assert row.text == r.text and row.lang == r.lang
        assert row.source == r.source
        assert row.shard == r.doc_id % 32
    grp = out[out.shard == 5].sort_values("row_idx")
    # read-back order within a shard is id-sorted write order
    assert list(grp.index) == [5, 37, 69]
    assert (grp.n_in_shard == 3).all()
    solo = out[out.shard == 1]
    assert (solo.n_in_shard == 1).all() and (solo.row_idx == 0).all()


def test_orc_roundtrip_deterministic(spark):
    import pandas as pd

    from ocr_spark import sources

    pdf = pd.DataFrame(
        {
            "doc_id": range(50),
            "text": [f"doc {i} körper" for i in range(50)],
            "lang": ["en"] * 50,
            "source": ["web"] * 50,
        }
    )
    df = spark.createDataFrame(pdf)
    a = sources.orc_roundtrip(df).toPandas().sort_values("doc_id")
    b = sources.orc_roundtrip(df).toPandas().sort_values("doc_id")
    assert (a.values == b.values).all()


def test_orc_roundtrip_preserves_nulls(spark):
    # ADVICE r4: str() coercion turned NULL lang/source/text into the
    # literal 'None'; pa.array over the raw pandas values keeps ORC nulls.
    from ocr_spark import sources

    schema = "doc_id long, text string, lang string, source string"
    df = spark.createDataFrame(
        [(0, "body", None, "web"), (1, None, "en", None)], schema=schema
    )
    out = (
        sources.orc_roundtrip(df, shards=32)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "lang"] is None and out.loc[0, "text"] == "body"
    assert out.loc[1, "text"] is None and out.loc[1, "source"] is None
    assert out.loc[1, "lang"] == "en"


def test_arrow_ipc_roundtrip_recovers_everything(spark):
    import pandas as pd

    from ocr_spark import sources

    pdf = pd.DataFrame(
        {
            "doc_id": [5, 37, 69, 1],          # 5/37/69 share shard 5
            "text": ["plain", "üñíçødé 数据 π", "", "tab\tand\nnewline"],
            "lang": ["en", "de", "en", "fr"],
            "source": ["web", "web", "books", "web"],
        }
    )
    out = (
        sources.arrow_ipc_roundtrip(spark.createDataFrame(pdf), shards=32)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(out) == 4
    for _, r in pdf.iterrows():
        row = out.loc[r.doc_id]
        assert row.text == r.text and row.lang == r.lang
        assert row.source == r.source
        assert row.shard == r.doc_id % 32
    grp = out[out.shard == 5].sort_values("row_idx")
    # read-back order within a shard is id-sorted serialization order
    assert list(grp.index) == [5, 37, 69]
    assert (grp.n_in_shard == 3).all()


def test_arrow_ipc_roundtrip_preserves_nulls(spark):
    from ocr_spark import sources

    schema = "doc_id long, text string, lang string, source string"
    df = spark.createDataFrame(
        [(0, "body", None, "web"), (1, None, "en", None)], schema=schema
    )
    out = (
        sources.arrow_ipc_roundtrip(df, shards=32)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "lang"] is None and out.loc[0, "text"] == "body"
    assert out.loc[1, "text"] is None and out.loc[1, "source"] is None
    assert out.loc[1, "lang"] == "en"


def test_arrow_ipc_roundtrip_is_real_ipc_stream(spark):
    # The serialized payload must be a REAL Arrow IPC stream: encode a
    # shard by hand with the same kernel path and verify pyarrow's
    # reader accepts it and returns identical columns.
    import io

    import pyarrow as pa

    table = pa.table({"id": pa.array([1, 2], pa.int64())})
    buf = io.BytesIO()
    with pa.ipc.new_stream(buf, table.schema) as w:
        w.write_table(table)
    raw = buf.getvalue()
    # Arrow IPC streams open with a 0xFFFFFFFF continuation marker
    assert raw[:4] == b"\xff\xff\xff\xff"
    with pa.ipc.open_stream(io.BytesIO(raw)) as r:
        assert r.read_all().column("id").to_pylist() == [1, 2]


def test_zip_roundtrip_preserves_text_and_sizes(spark):
    from ocr_spark import sources as src

    rows = [
        (0, "plain ascii"),
        (1, "unicodé ← ☃"),          # multibyte: n_bytes > n_chars
        (32, "same shard as doc 0"),  # member order within shard
        (3, None),                    # NULL text: skipped by contract
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in src.zip_roundtrip(df).collect()}
    assert 3 not in out and len(out) == 3
    assert out[1].text == "unicodé ← ☃"
    assert out[1].n_bytes == len("unicodé ← ☃".encode("utf-8"))
    # shard 0 holds docs 0 and 32 in id order
    assert out[0].shard == out[32].shard == 0
    assert (out[0].member_idx, out[32].member_idx) == (0, 1)
    assert out[0].n_in_shard == 2 and out[1].n_in_shard == 1
