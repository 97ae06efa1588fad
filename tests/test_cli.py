"""CLI lifecycle: package → build → query → incremental → compact → clean.

Runs in-process against the shared session (subprocess spark-submit is
exercised manually/bench-side; the argparse + lifecycle wiring is what
needs regression coverage)."""

from __future__ import annotations

import json
import os
import zipfile

import pytest

from mee_spark import manifest as mf
from mee_spark.cli import cmd_package, main
from mee_spark.fixtures import gen_pages


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("clicorpus") / "pages")
    gen_pages(spark, 300, num_partitions=4).write.mode("overwrite").parquet(p)
    return p


def _args(extra, index):
    return extra + ["--index", index, "--partitions", "8",
                    "--buckets", "4", "--range-size", "128"]


def test_cli_lifecycle(spark, corpus, tmp_path, capsys):
    os.environ["MEE_SPARK_MASTER"] = "local[4]"
    idx = str(tmp_path / "idx")
    main(_args(["build", "--pages", corpus, "--gen", "1"], idx))
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["generation"] == 1 and out["docs_per_sec"] > 0
    assert mf.current_gen(idx) == 1

    main(_args(["query", "--query", "w000000 w000123", "--k", "5"], idx))
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert lines and lines[0]["rank"] == 1
    assert all(l["score"] >= lines[-1]["score"] for l in lines)

    main(_args(["build", "--pages", corpus, "--incremental"], idx))
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["generation"] == 2 and out["docs_added"] == 0  # same corpus: no-op delta

    main(_args(["compact"], idx))
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["generation"] == 3
    main(_args(["clean"], idx))
    removed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["removed"]
    assert sorted(removed) == [1, 2]


def test_cli_lock_guard(spark, corpus, tmp_path, capsys):
    idx = str(tmp_path / "idx2")
    assert mf.acquire_lock(idx)
    with pytest.raises(SystemExit):
        main(_args(["build", "--pages", corpus, "--gen", "1"], idx))
    mf.release_lock(idx)


def test_cli_package(tmp_path, capsys):
    out = str(tmp_path / "pkg.zip")
    main(["package", "--out", out])
    names = zipfile.ZipFile(out).namelist()
    assert "mee_spark/wand.py" in names and "mee_spark/cli.py" in names
