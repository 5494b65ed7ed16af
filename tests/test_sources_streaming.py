"""CoNLL-U source, export sinks, text utils, viz, streaming ingest."""

import glob

import pytest
from pyspark.sql import functions as F

from word_sketch_lucene_spark.functions.text import detokenize_expr, normalize_expr
from word_sketch_lucene_spark.sources.conllu import (
    conllu_boilerplate_filter,
    parse_conllu_text,
    read_conllu,
    write_chunks,
)
from word_sketch_lucene_spark.sources.export import export_csv, export_xml, to_xml_rows
from word_sketch_lucene_spark.viz import radial_plot_svg

SAMPLE_CONLLU = """\
# newdoc id = d1
# sent_id = 1
# text = The big dog barked.
1\tThe\tthe\tDET\tDT\t_\t2\tdet\t_\t_
2-3\tbigdog\t_\t_\t_\t_\t_\t_\t_\t_
2\tbig\tbig\tADJ\tJJ\t_\t3\tamod\t_\t_
3\tdog\tdog\tNOUN\tNN\t_\t4\tnsubj\t_\t_
3.1\tghost\t_\t_\t_\t_\t_\t_\t_\t_
4\tbarked\tbark\tVERB\tVBD\t_\t0\troot\t_\t_

# sent_id = 2
1\tCopyright\tcopyright\tNOUN\tNN\t_\t0\troot\t_\t_
2\tnotice\tnotice\tNOUN\tNN\t_\t1\tobj\t_\t_
"""


def test_parse_conllu_skips_mwt_and_comments():
    rows = parse_conllu_text("d1", SAMPLE_CONLLU)
    words = [r[3] for r in rows]
    assert words == ["The", "big", "dog", "barked", "Copyright", "notice"]
    assert all(r[1] == 0 for r in rows[:4])       # first sentence
    assert all(r[1] == 1 for r in rows[4:])       # second sentence
    # (doc, sent, tid, word, lemma, upos, xpos, head, deprel)
    assert rows[1][:3] == ("d1", 0, 2) and rows[1][8] == "amod"


def test_read_conllu_spark(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"f{i}.conllu").write_text(SAMPLE_CONLLU)
    df = read_conllu(spark, str(tmp_path / "*.conllu"))
    assert df.count() == 18
    assert set(df.select("deprel").distinct().toPandas()["deprel"]) == \
        {"det", "amod", "nsubj", "root", "obj"}


def test_conllu_boilerplate_filter(spark, tmp_path):
    (tmp_path / "f.conllu").write_text(SAMPLE_CONLLU)
    df = read_conllu(spark, str(tmp_path / "*.conllu"))
    kept = conllu_boilerplate_filter(df, ("Copyright",))
    assert kept.count() == 4  # second sentence dropped whole
    assert kept.filter(F.col("word") == "notice").count() == 0


def test_write_chunks(spark, tmp_path, docs_small):
    out = tmp_path / "chunks"
    write_chunks(docs_small, str(out), 5)
    assert len(glob.glob(str(out / "part-*"))) == 5


def test_export_csv_rfc4180(spark, tmp_path):
    df = spark.createDataFrame([("a,b", 'say "hi"'), ("plain", "x")],
                               ["c1", "c2"])
    out = tmp_path / "csv"
    export_csv(df, str(out))
    content = open(glob.glob(str(out / "part-*.csv"))[0]).read()
    assert '"a,b"' in content and '"say ""hi"""' in content


def test_export_xml_escaped(spark, tmp_path):
    df = spark.createDataFrame([("a<b&c", 1)], ["term", "freq"])
    rows = to_xml_rows(df).collect()
    assert rows[0]["xml"] == '<row term="a&lt;b&amp;c" freq="1"/>'
    out = tmp_path / "xml"
    export_xml(df, str(out), root_tag="sketch")
    content = "".join(open(f).read() for f in
                      sorted(glob.glob(str(out / "part-*"))))
    assert content.startswith("<sketch>") and content.rstrip().endswith("</sketch>")


def test_text_utils(spark):
    df = spark.createDataFrame([("  Hello World ,  okay ( yes )!",)], ["t"])
    got = df.select(
        normalize_expr(F.col("t")).alias("norm"),
        detokenize_expr(F.col("t")).alias("detok"),
    ).collect()[0]
    assert got["norm"] == "hello world ,  okay ( yes )!"
    assert got["detok"] == "  Hello World,  okay (yes)!"


def test_radial_plot_svg():
    svg = radial_plot_svg([(f"w{i}", 14.0 - i * 0.3) for i in range(40)],
                          title="test")
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert svg.count("<circle") == 30  # W5 top-30 clamp
    assert "w0 (14.00)" in svg


def test_streaming_ingest_and_compact(spark, tmp_path):
    from word_sketch_lucene_spark.query.engine import IndexSearcher
    from word_sketch_lucene_spark.sources.pages import generate_pages
    from word_sketch_lucene_spark.streaming.ingest import (
        compact_deltas,
        ingest_available_now,
        live_delta_roots,
    )

    pages_dir = tmp_path / "pages"
    work = tmp_path / "work"
    # drop two files, ingest, drop one more, ingest again
    all_pages = generate_pages(spark, 120, seed=33).select("doc_id", "text").cache()
    all_pages.filter("doc_id < 40").coalesce(1).write.mode("append").parquet(str(pages_dir))
    all_pages.filter("doc_id >= 40 and doc_id < 80").coalesce(1).write.mode("append").parquet(str(pages_dir))
    built1 = ingest_available_now(spark, str(pages_dir), work,
                                  doc_salt=2, n_partitions=4,
                                  max_files_per_batch=1)
    assert len(built1) >= 1
    all_pages.filter("doc_id >= 80").coalesce(1).write.mode("append").parquet(str(pages_dir))
    built2 = ingest_available_now(spark, str(pages_dir), work,
                                  doc_salt=2, n_partitions=4)
    assert len(built2) >= 1          # only the NEW file was processed
    live = compact_deltas(spark, work, max_live=1)
    assert len(live) == 1
    s = IndexSearcher(spark, live[0])
    assert s.stats["n_docs"] == 120  # every doc indexed exactly once


def test_windowed_event_counts(spark, tmp_path):
    import shutil

    from word_sketch_lucene_spark.streaming.ingest import windowed_event_counts

    events_dir = tmp_path / "events"
    events_dir.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet",
                events_dir / "events.parquet")
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df = windowed_event_counts(
        spark, str(events_dir), schema,
        window="10 minutes", watermark="1 minute")
    rows = df.collect()
    assert rows and all(r["n"] > 0 for r in rows)
    # cross-check one window against a batch aggregation
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    expected = (batch.groupBy(F.window("ts", "10 minutes"), "event_type")
                .agg(F.count("*").alias("n")).collect())
    exp = {(r["window"]["start"], r["event_type"]): r["n"] for r in expected}
    got = {(r["ws"], r["event_type"]): r["n"] for r in rows}
    # all closed windows must match the batch result exactly
    for k, v in got.items():
        assert exp[k] == v


def test_streaming_dedup_stateful(spark, tmp_path):
    """Cross-micro-batch dedup: duplicates arriving in LATER batches are
    suppressed by the per-digest state cell."""
    from word_sketch_lucene_spark.streaming.dedup import (
        streaming_dedup_stateful,
        streaming_exact_dedup,
    )

    src = tmp_path / "stream_src"
    src.mkdir()
    # batch 1: docs 0,1 (distinct) — batch 2: doc 2 repeats doc 0's text
    spark.createDataFrame([(0, "alpha beta"), (1, "gamma delta")],
                          ["doc_id", "text"]) \
        .coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame([(2, "alpha beta"), (3, "epsilon zeta")],
                          ["doc_id", "text"]) \
        .coalesce(1).write.parquet(str(src / "b2"))
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src / "*")))
    out = streaming_dedup_stateful(stream)
    q = (out.writeStream.format("memory").queryName("dedup_state")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM dedup_state").collect()
    by_digest = {}
    for r in rows:
        assert r["digest"] not in by_digest, "digest emitted twice"
        by_digest[r["digest"]] = r["doc_id"]
    assert len(by_digest) == 3  # 3 distinct texts, duplicate suppressed
    assert set(by_digest.values()) <= {0, 1, 2, 3}

    # built-in variant agrees on the digest set
    q2 = (streaming_exact_dedup(
            spark.readStream.schema("doc_id long, text string")
            .parquet(str(src / "*")))
          .writeStream.format("memory").queryName("dedup_builtin")
          .outputMode("append")
          .option("checkpointLocation", str(tmp_path / "ckpt2"))
          .trigger(availableNow=True).start())
    q2.awaitTermination()
    got = {r["digest"] for r in spark.sql(
        "SELECT digest FROM dedup_builtin").collect()}
    assert got == set(by_digest)


def test_to_wpl_text_sentence_markers(spark):
    """WPL export (reference scripts/conllu_to_wpl.py): <s>-marked
    tabular lines, MWT/empty-node rows already dropped by the parser."""
    from word_sketch_lucene_spark.sources.conllu import (
        parse_conllu_docs,
        to_wpl_text,
    )

    conllu = (
        "# sent_id = 1\n"
        "1\tThe\tthe\tDET\tDT\t_\t2\tdet\n"
        "2\tcat\tcat\tNOUN\tNN\t_\t0\troot\n"
        "\n"
        "1-2\tdel\t_\t_\t_\t_\t_\t_\n"
        "1\tA\ta\tDET\tDT\t_\t2\tdet\n"
        "2\tdog\tdog\tNOUN\tNN\t_\t0\troot\n"
    )
    docs = spark.createDataFrame([(7, conllu)], "doc_id long, conllu string")
    out = to_wpl_text(parse_conllu_docs(docs)).collect()
    assert len(out) == 1
    wpl = out[0]["wpl"]
    assert wpl.count("<s>") == 2 and wpl.count("</s>") == 2
    assert "The\tthe\tDET\tDT" in wpl and "dog\tdog\tNOUN\tNN" in wpl
    assert "del" not in wpl  # MWT dropped
    # sentence order preserved
    assert wpl.index("cat\t") < wpl.index("A\t")


def test_streaming_conllu_ingest_incremental(spark, tmp_path):
    """availableNow CoNLL-U stream: run 1 builds the base multi-layer
    index from the files present; a new file lands; run 2 folds ONLY it
    in (checkpoint-tracked) via the LSM conllu merge — searchable
    layers, forward arrays, and name↔id mapping all current."""
    from word_sketch_lucene_spark.query.engine import IndexSearcher
    from word_sketch_lucene_spark.streaming.ingest import (
        ingest_conllu_available_now,
    )

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    def write(name, sents):
        lines = []
        for s in sents:
            toks = s.split()
            for i, w in enumerate(toks, start=1):
                upos = "VERB" if w in ("sleeps", "bark", "barks") else "NOUN"
                xpos = "VB" if upos == "VERB" else "NN"
                head = 0 if upos == "VERB" else min(i + 1, len(toks))
                rel = "root" if head == 0 else "nsubj"
                lines.append(f"{i}\t{w}\t{w.rstrip('s')}\t{upos}\t{xpos}"
                             f"\t_\t{head}\t{rel}")
            lines.append("")
        (corpus / name).write_text("\n".join(lines) + "\n")

    write("a.conllu", ["cat sleeps", "dogs bark"])
    write("b.conllu", ["cat barks"])
    work = tmp_path / "work"
    root = tmp_path / "idx"
    r1 = ingest_conllu_available_now(spark, str(corpus), work, root,
                                     doc_salt=1, n_partitions=2)
    s1 = IndexSearcher(spark, r1)
    assert s1.stats["n_docs"] == 2
    assert len(s1.search(["cat"], k=5)[0]) == 2

    write("c.conllu", ["cat naps", "birds sing"])
    r2 = ingest_conllu_available_now(spark, str(corpus), work, root,
                                     doc_salt=1, n_partitions=2)
    assert r2 != r1
    s2 = IndexSearcher(spark, r2)
    assert s2.stats["n_docs"] == 3
    assert len(s2.search(["cat"], k=5)[0]) == 3
    # layers + relation machinery survive the merge
    assert s2.pattern_hits('[upos="NOUN"] [xpos="VB"]')
    names = {r["doc_name"] for r in
             spark.read.parquet(str(r2 / "doc_names")).collect()}
    assert names == {"a.conllu", "b.conllu", "c.conllu"}
    # re-run with nothing new: checkpoint says no batch, root unchanged
    r3 = ingest_conllu_available_now(spark, str(corpus), work, root,
                                     doc_salt=1, n_partitions=2)
    assert s1.stats["n_docs"] == 2  # old root untouched (readers valid)
    assert IndexSearcher(spark, r3).stats["n_docs"] == 3
