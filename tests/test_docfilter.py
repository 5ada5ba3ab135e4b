"""Ground-truth tests for the Gopher-rule document filter
(queries/docfilter.py): hand-built documents with known verdicts per rule,
plus hostile-input edges."""

from __future__ import annotations

from notion_timetracking_etl_spark.queries.docfilter import _per_doc_rules


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t) if t else 0) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


GOOD = ("the cat sat on a mat and then walked to the door of the house "
        "with quiet steps that nobody heard before it came back inside "
        "again while rain kept falling over every roof in town and the "
        "small lights went dim one by one until only ours stayed lit")


def _verdicts(spark, sf_dir):
    return {
        r["doc_id"]: r.asDict()
        for r in _per_doc_rules(spark, sf_dir).collect()
    }


def test_good_document_passes_all_rules(spark, tmp_path):
    sf_dir = _write_docs(spark, tmp_path, [(0, GOOD)])
    v = _verdicts(spark, sf_dir)[0]
    assert all(v[f"r{i}"] for i in range(6)), v


def test_word_count_rule_bounds(spark, tmp_path):
    # 10 words < 50 minimum -> r0 fails; everything else about it is fine
    short = "the cat sat on a mat with that old dog"
    sf_dir = _write_docs(spark, tmp_path, [(0, short), (1, GOOD)])
    v = _verdicts(spark, sf_dir)
    assert v[0]["r0"] is False and v[1]["r0"] is True


def test_mean_word_length_rule(spark, tmp_path):
    # 60 one-letter words: mean word length 1 < 3 -> r1 fails
    ones = " ".join(["a b c d e f"] * 10)
    # 50 twelve-letter words: mean 12 > 10 -> r1 fails
    longs = " ".join(["abcdefghijkl"] * 50)
    sf_dir = _write_docs(spark, tmp_path, [(0, ones), (1, longs), (2, GOOD)])
    v = _verdicts(spark, sf_dir)
    assert v[0]["r1"] is False
    assert v[1]["r1"] is False
    assert v[2]["r1"] is True


def test_alpha_words_rule(spark, tmp_path):
    # 30 of 60 words are pure digits -> alpha fraction 0.5 < 0.8 -> r2 fails
    digity = " ".join(["123 456 789 the cat sat"] * 10)
    sf_dir = _write_docs(spark, tmp_path, [(0, digity), (1, GOOD)])
    v = _verdicts(spark, sf_dir)
    assert v[0]["r2"] is False and v[1]["r2"] is True


def test_stop_words_rule(spark, tmp_path):
    # 'the' is the ONLY stop word -> n_stop = 1 < 2 -> r3 fails
    one_stop = " ".join(["the cat sat cat mat dog"] * 10)
    sf_dir = _write_docs(spark, tmp_path, [(0, one_stop), (1, GOOD)])
    v = _verdicts(spark, sf_dir)
    assert v[0]["r3"] is False and v[1]["r3"] is True


def test_top_2gram_rule(spark, tmp_path):
    # 'spam spam' repeated: the top 2-gram covers ~100% of slots -> r4 fails
    spammy = " ".join(["spam"] * 60)
    sf_dir = _write_docs(spark, tmp_path, [(0, spammy), (1, GOOD)])
    v = _verdicts(spark, sf_dir)
    assert v[0]["r4"] is False and v[1]["r4"] is True


def test_dup_3gram_rule(spark, tmp_path):
    # one 6-word sentence repeated 10x: 55 3-grams, ~8 distinct -> r5 fails
    loopy = " ".join(["the cat sat on a mat"] * 10)
    sf_dir = _write_docs(spark, tmp_path, [(0, loopy), (1, GOOD)])
    v = _verdicts(spark, sf_dir)
    assert v[0]["r5"] is False and v[1]["r5"] is True


def test_hostile_inputs_do_not_error(spark, tmp_path):
    # NULL text is excluded; empty and single-word docs evaluate (and fail
    # word_count) without erroring on the gram fallbacks
    sf_dir = _write_docs(
        spark, tmp_path, [(0, None), (1, ""), (2, "solo"), (3, GOOD)]
    )
    v = _verdicts(spark, sf_dir)
    assert set(v) == {1, 2, 3}
    assert v[1]["r0"] is False and v[2]["r0"] is False
    assert v[3]["r0"] is True
