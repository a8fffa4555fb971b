"""CLI surface tests (in-process main() calls against sf0.001 testdata)."""

import json

import pytest

from dqx_spark.cli import main

SF = "/root/testdata/sf0.001"


def test_cli_clean(spark, tmp_path, capsys):
    out = str(tmp_path / "cleaned")
    rc = main(
        [
            "clean",
            "--input", f"{SF}/documents.parquet",
            "--output", out,
            "--languages", "en", "de", "fr", "es",
            "--min-words", "10",
            "--boilerplate-doc-freq", "3",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["input_rows"] == 500
    assert 0 < stats["kept_rows"] < 500
    back = spark.read.parquet(out)
    assert "split" in back.columns
    assert back.count() == stats["kept_rows"]


def test_cli_validate_checks(tmp_path, capsys):
    checks = tmp_path / "checks.yaml"
    checks.write_text(
        "- criticality: error\n"
        "  check:\n"
        "    function: is_not_null\n"
        "    arguments:\n"
        "      column: l_orderkey\n"
    )
    assert main(["validate-checks", "--checks", str(checks)]) == 0
    assert "OK: 1 checks valid" in capsys.readouterr().out
    bad = tmp_path / "bad.yaml"
    bad.write_text("- criticality: error\n  check:\n    function: no_such_check\n")
    assert main(["validate-checks", "--checks", str(bad)]) == 1


def test_cli_llm_generate(spark, tmp_path, capsys, monkeypatch):
    # fake provider importable via 'module:attribute'
    prov = tmp_path / "fake_llm_provider.py"
    prov.write_text(
        "import json\n"
        "def complete(prompt):\n"
        "    return json.dumps([\n"
        "        {'criticality': 'error',\n"
        "         'check': {'function': 'is_not_null', 'arguments': {'column': 'o_orderkey'}}}\n"
        "    ]).replace(chr(39), chr(34))\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    out = str(tmp_path / "llm_checks.yaml")
    rc = main(
        [
            "llm-generate",
            "--input", f"{SF}/orders.parquet",
            "--provider", "fake_llm_provider:complete",
            "--output", out,
        ]
    )
    assert rc == 0
    assert "wrote 1 LLM-generated checks" in capsys.readouterr().out
    from dqx_spark.serde import load_checks_from_file

    assert load_checks_from_file(out)[0]["check"]["function"] == "is_not_null"


def test_cli_profile_and_apply(spark, tmp_path, capsys):
    checks = str(tmp_path / "checks.yaml")
    assert (
        main(["profile", "--input", f"{SF}/orders.parquet", "--output", checks, "--limit", "200"]) == 0
    )
    out, quar = str(tmp_path / "good"), str(tmp_path / "bad")
    rc = main(
        ["apply", "--input", f"{SF}/orders.parquet", "--checks", checks, "--output", out, "--quarantine", quar]
    )
    assert rc == 0
    assert spark.read.parquet(out).count() > 0


def test_cli_clean_with_decontamination(spark, tmp_path, capsys):
    """--eval-input wires exact + fuzzy decontamination into the CLI chain."""
    eval_dir = str(tmp_path / "eval")
    # the eval set = 10 driver documents verbatim -> those docs must drop
    spark.read.parquet(f"{SF}/documents.parquet").where("doc_id % 50 = 0").write.parquet(eval_dir)
    out = str(tmp_path / "cleaned_decontam")
    rc = main(
        [
            "clean",
            "--input", f"{SF}/documents.parquet",
            "--output", out,
            "--min-words", "3",
            "--eval-input", eval_dir,
            "--contamination-threshold", "0.5",
            "--fuzzy-contamination-threshold", "0.8",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    back = spark.read.parquet(out)
    kept_ids = {r.doc_id for r in back.select("doc_id").collect()}
    assert not any(i % 50 == 0 for i in kept_ids), "verbatim eval copies must be dropped"
    assert stats["kept_rows"] == len(kept_ids) > 0


def test_cli_clean_decontamination_flags_require_eval_input(tmp_path, capsys):
    rc = main(
        ["clean", "--input", f"{SF}/documents.parquet", "--output", str(tmp_path / "o"),
         "--fuzzy-contamination-threshold", "0.8"]
    )
    assert rc == 2
    assert "require --eval-input" in capsys.readouterr().err


def test_cli_run_from_config_file(spark, tmp_path, capsys):
    """End-to-end 'run' subcommand: config file -> fan-out -> outputs +
    quarantine + summary metrics."""
    from dqx_spark.io import InputConfig, OutputConfig, RunConfig, save_run_configs

    checks = tmp_path / "checks.yaml"
    checks.write_text(
        "- criticality: error\n"
        "  check:\n"
        "    function: is_in_range\n"
        "    arguments: {column: l_quantity, min_limit: 5, max_limit: 45}\n"
    )
    out_dir, bad_dir = str(tmp_path / "good"), str(tmp_path / "bad")
    rcs = [
        RunConfig(
            name="li",
            input_config=InputConfig(location=f"{SF}/lineitem.parquet"),
            output_config=OutputConfig(location=out_dir, mode="overwrite"),
            quarantine_config=OutputConfig(location=bad_dir, mode="overwrite"),
            checks_location=str(checks),
        ),
    ]
    cfg = str(tmp_path / "runs.yaml")
    save_run_configs(rcs, cfg)
    rc = main(["run", "--run-configs", cfg])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "li" in stats
    good = spark.read.parquet(out_dir)
    bad = spark.read.parquet(bad_dir)
    total = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    assert good.count() + bad.count() == total
    assert bad.count() > 0 and "_errors" in bad.columns and "_errors" not in good.columns
    # unknown name -> clean error
    assert main(["run", "--run-configs", cfg, "--names", "nope"]) == 2


def test_cli_compact(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    src = str(tmp_path / "frag")
    spark.range(5000).select(
        F.col("id"), (F.col("id") % 5).alias("k")
    ).repartition(20).write.parquet(src)
    out = str(tmp_path / "compacted")
    rc = main(["compact", "--input", src, "--output", out, "--records-per-file", "10000", "--sort-by", "k"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["before"]["files"] == 20 and stats["before"]["rows"] == 5000
    assert stats["after"]["rows"] == 5000 and stats["after"]["files"] < 20
    assert stats["after"]["errors"] == 0


def test_cli_index_compact(spark, tmp_path, capsys):
    """r10: the index-compact subcommand rewrites both index families into
    a fresh path with row parity reported; reruns need --overwrite."""
    from pyspark.sql import functions as F

    from dqx_spark.pipeline import dedup_index as di, similarity as sim

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = sim.ivf_train_centroids(emb, "embedding", n_centroids=4, seed=1,
                                    max_iter=5, n_init=1, sample_order_by="vec_id")
    idx = sim.ivf_assign_buckets(emb, cents, "embedding", "vec_id")
    src = str(tmp_path / "ann")
    sim.save_ann_index(idx.where(F.col("id") % 3 != 0), src, cents, None)
    sim.append_to_ann_index(emb.where(F.col("vec_id") % 3 == 0), src, "embedding", "vec_id")
    dst = str(tmp_path / "ann_v2")
    rc = main(["index-compact", "--kind", "ann", "--input", src, "--output", dst])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows_src"] == rep["rows_dst"] == emb.count()
    rc2 = main(["index-compact", "--kind", "ann", "--input", src, "--output", dst,
                "--overwrite"])
    assert rc2 == 0
    capsys.readouterr()

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    dsrc = str(tmp_path / "dd")
    di.save_dedup_index(docs, dsrc, "doc_id", "text", method="exact", partitions=8)
    ddst = str(tmp_path / "dd_v2")
    rc3 = main(["index-compact", "--kind", "dedup", "--input", dsrc, "--output", ddst])
    assert rc3 == 0
    rep3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep3["rows_src"] == rep3["rows_dst"] == 60

    lsrc = str(tmp_path / "lsh")
    sim.save_lsh_index(emb.where(F.col("vec_id") % 3 != 0), lsrc, "embedding", "vec_id",
                       num_planes=4, num_tables=4)
    sim.append_to_lsh_index(emb.where(F.col("vec_id") % 3 == 0), lsrc, "embedding", "vec_id")
    ldst = str(tmp_path / "lsh_v2")
    rc4 = main(["index-compact", "--kind", "lsh", "--input", lsrc, "--output", ldst])
    assert rc4 == 0
    rep4 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep4["rows_src"] == rep4["rows_dst"] == emb.count()


def test_cli_sketch_build_and_report(spark, tmp_path, capsys):
    """r10: the per-batch incremental-stats loop from the command line -
    two appended batches re-merge to the whole-corpus estimate; knob
    mismatch on append fails; every kind reports."""
    out = str(tmp_path / "hll")
    rc = main(["sketch-build", "--kind", "hll", "--input", f"{SF}/lineitem.parquet",
               "--output", out, "--cols", "l_orderkey", "--hash-name", "md5"])
    assert rc == 0
    capsys.readouterr()
    rc = main(["sketch-report", "--input", out])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = li.select("l_orderkey").distinct().count()
    assert abs(rep["distinct_estimate"] / exact - 1.0) < 0.1

    # append a second batch; knob mismatch rejected via save_sketch
    rc = main(["sketch-build", "--kind", "hll", "--input", f"{SF}/lineitem.parquet",
               "--output", out, "--cols", "l_orderkey", "--hash-name", "md5", "--append"])
    assert rc == 0
    capsys.readouterr()
    import pytest as _pytest
    with _pytest.raises(ValueError, match="disagree with the sidecar"):
        main(["sketch-build", "--kind", "hll", "--input", f"{SF}/lineitem.parquet",
              "--output", out, "--cols", "l_orderkey", "--p", "8", "--hash-name", "md5",
              "--append"])
    # r11 (r10 ADVICE): the sidecar records the sketched COLUMNS, so an
    # append over a DIFFERENT column with identical hashing knobs is now
    # caught too (it would silently corrupt the merged estimate)
    with _pytest.raises(ValueError, match="disagree with the sidecar"):
        main(["sketch-build", "--kind", "hll", "--input", f"{SF}/orders.parquet",
              "--output", out, "--cols", "o_orderkey", "--hash-name", "md5",
              "--append"])

    mout = str(tmp_path / "mom")
    assert main(["sketch-build", "--kind", "moments", "--input", f"{SF}/lineitem.parquet",
                 "--output", mout, "--cols", "l_quantity"]) == 0
    capsys.readouterr()
    assert main(["sketch-report", "--input", mout]) == 0
    mrep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert mrep["n"] == li.count()

    hout = str(tmp_path / "hist")
    assert main(["sketch-build", "--kind", "hist", "--input", f"{SF}/lineitem.parquet",
                 "--output", hout, "--cols", "l_quantity", "--lo", "1", "--hi", "51",
                 "--bins", "50"]) == 0
    capsys.readouterr()
    assert main(["sketch-report", "--input", hout, "--quantiles", "0.5", "0.9"]) == 0
    hrep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(hrep["quantiles"]) == {"0.5", "0.9"}
    assert 1 <= hrep["quantiles"]["0.5"] <= 51

    cout = str(tmp_path / "cms")
    assert main(["sketch-build", "--kind", "cms", "--input", f"{SF}/lineitem.parquet",
                 "--output", cout, "--cols", "l_returnflag", "--hash-name", "md5"]) == 0
    capsys.readouterr()
    assert main(["sketch-report", "--input", cout, "--probe", "A", "N"]) == 0
    crep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    exact_a = li.where("l_returnflag = 'A'").count()
    assert crep["counts"]["A"] == exact_a  # 3 values in 1024 buckets: exact

    tout = str(tmp_path / "tok")
    assert main(["sketch-build", "--kind", "tokens", "--input", f"{SF}/documents.parquet",
                 "--output", tout, "--cols", "text"]) == 0
    capsys.readouterr()
    assert main(["sketch-report", "--input", tout]) == 0
    trep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert trep["total_tokens"] > trep["vocab"] > 0


def test_cli_text_index_compact_and_maintenance(spark, tmp_path, capsys):
    """r12: the text (inverted-index) family joins the CLI maintenance
    loop — index-maintenance exits 2 when append debt trips the shared
    files-per-partition policy, index-compact --store pays it down and
    flips the pointer, and the verdict returns to ok (exit 0)."""
    from pyspark.sql import functions as F

    from dqx_spark.pipeline import text_index as ti

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    root = str(tmp_path / "tstore")
    ti.init_text_store(docs.limit(0), root, "doc_id", "text", partitions=8)
    cur = ti.current_text_store_version(spark, root)
    for m in range(4):
        ti.append_to_text_index(cur, docs.where(F.col("doc_id") % 4 == m))

    # 4 appended partials per pb bucket > threshold 2 -> compact (exit 2);
    # a store ROOT resolves structurally, no version path needed
    rc = main(["index-maintenance", "--kind", "text", "--input", root,
               "--max-files-per-partition", "2"])
    assert rc == 2
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["action"] == "compact" and rep["stats"]["family"] == "text"

    rc2 = main(["index-compact", "--store", "--kind", "text", "--input", root])
    assert rc2 == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["new_version"] == root + "/v1"

    rc3 = main(["index-maintenance", "--kind", "text", "--input", root,
                "--max-files-per-partition", "2"])
    assert rc3 == 0
    capsys.readouterr()

    # plain-path compaction reports postings row parity
    dst = str(tmp_path / "t_v2")
    rc4 = main(["index-compact", "--kind", "text", "--input", root + "/v1",
                "--output", dst])
    assert rc4 == 0
    rep4 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep4["rows_src"] == rep4["rows_dst"] > 0


def test_cli_store_gc(spark, tmp_path, capsys):
    """r12: store-gc deletes superseded versions, keeping current plus
    rollback targets — one retention pass for every store family."""
    from pyspark.sql import functions as F

    from dqx_spark.pipeline import text_index as ti

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text").limit(40)
    root = str(tmp_path / "tstore")
    ti.init_text_store(docs, root, "doc_id", "text", partitions=4)
    ti.compact_text_store(spark, root)
    ti.compact_text_store(spark, root)  # v0, v1, v2
    rc = main(["store-gc", "--kind", "text", "--input", root, "--keep", "2"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["deleted"] == [root + "/v0"]
    assert ti.current_text_store_version(spark, root) == root + "/v2"
