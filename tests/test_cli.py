"""CLI: spec-file job run (the reference mrclient's -mrspec path)."""

from __future__ import annotations

import json
import os


def test_cli_run_spec(spark, tmp_path, capsys, monkeypatch):
    # reuse the test session instead of building a new one
    import cloud_native_mapreduce_spark.session as sess
    monkeypatch.setattr(sess, "get_spark", lambda *a, **k: spark)

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "x.txt").write_text("aa bb aa", encoding="utf-8")

    scripts = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts")
    spec = {
        "input_paths": [str(corpus)],
        "mapper": os.path.join(scripts, "wordcount_mapper.py"),
        "reducer": os.path.join(scripts, "wordcount_reducer.py"),
        "num_map_tasks": 1,
        "num_reduce_tasks": 1,
        "output_dir": str(tmp_path / "out"),
    }
    spec_path = tmp_path / "spec.json"
    spec_path.write_text(json.dumps(spec), encoding="utf-8")

    from cloud_native_mapreduce_spark import cli
    # cli resolves get_spark at call time from its own import — patch it
    monkeypatch.setattr(
        "cloud_native_mapreduce_spark.session.get_spark",
        lambda *a, **k: spark)
    rc = cli.main(["run", str(spec_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    lines = []
    for f in out["files"]:
        with open(f, encoding="utf-8") as fh:
            lines += [ln.strip() for ln in fh if ln.strip()]
    assert sorted(lines) == ["aa\t2", "bb\t1"]
