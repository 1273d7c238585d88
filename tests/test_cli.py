"""CLI smoke tests: each mode driven through the real entry point in a
subprocess (own Ray session, like a user's shell)."""

import subprocess
import sys

import pytest

SENTENCES = """Alice , Bob and Carol founded Acme Corp in New York .
Dave , the CEO of Globex , acquired Initech .
the sum of X and Y increased .
"""


def run_cli(*argv, timeout=240):
    return subprocess.run(
        [sys.executable, "-m", "openie_with_entities_ray", *argv],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd="/root/repo",
    )


@pytest.fixture(scope="module")
def outputs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    inp = tmp / "sentences.txt"
    inp.write_text(SENTENCES)
    res = run_cli(
        "--mode", "splitpredict", "--inp", str(inp),
        "--out", str(tmp / "out"), "--type", "labels", "--num_cpus", "4",
    )
    assert res.returncode == 0, res.stderr[-800:]
    return tmp


def test_splitpredict_outputs(outputs):
    oie = (outputs / "out.oie").read_text()
    blocks = oie.strip("\n").split("\n\n")
    assert len(blocks) == 3  # every sentence gets a block
    assert blocks[0].splitlines()[0].startswith("Alice , Bob and Carol")
    assert "0.98: (Alice; founded; Acme Corp in New York)" in blocks[0]
    # unbreakable veto: no split for the 'sum of' sentence
    conj = (outputs / "out.conj").read_text()
    assert "the sum of X and Y increased ." in conj
    assert conj.count("Y increased .\n") == 1  # only inside the original
    labels = (outputs / "out.labels").read_text()
    assert "ARG1" in labels and "REL" in labels
    allennlp = (outputs / "out.allennlp").read_text()
    assert allennlp.count("\n") == allennlp.count("</arg2>")


def test_eval_round_trip(outputs):
    # predictions as their own gold → perfect under both matchers
    gold = outputs / "gold.tsv"
    lines = []
    for line in (outputs / "out.allennlp").read_text().splitlines():
        sent, tags, conf = line.split("\t")
        import re

        a1 = re.search(r"<arg1>\s*(.*?)\s*</arg1>", tags).group(1)
        rel = re.search(r"<rel>\s*(.*?)\s*</rel>", tags).group(1)
        a2 = re.search(r"<arg2>\s*(.*?)\s*</arg2>", tags).group(1)
        lines.append(f"{sent}\t{rel}\t{a1}\t{a2}")
    gold.write_text("\n".join(lines) + "\n")

    res = run_cli("--mode", "eval", "--gold", str(gold),
                  "--inp", str(outputs / "out.allennlp"))
    assert "AUC: 1.0" in res.stdout, res.stdout

    res57 = run_cli("--mode", "eval", "--matcher", "wire57",
                    "--gold", str(gold), "--inp", str(outputs / "out.allennlp"))
    assert "f1: 1.0000" in res57.stdout, res57.stdout


def test_convert_mode(outputs):
    res = run_cli("--mode", "convert", "--inp", str(outputs / "out.allennlp"),
                  "--threshold", "0.95")
    assert res.returncode == 0
    assert "0.98: (" in res.stdout
    assert "0.91:" not in res.stdout  # thresholded out


def test_missing_args_error():
    res = run_cli("--mode", "splitpredict", "--out", "/tmp/x")
    assert res.returncode != 0
    assert "requires --inp" in res.stderr


def test_dedup_job_resumable(tmp_path):
    """jobs/dedup_job.py: per-shard manifests; a re-run skips finished
    shards and writes nothing new."""
    import json

    out = tmp_path / "dedup"

    def run_job(*extra):
        return subprocess.run(
            [sys.executable, "jobs/dedup_job.py",
             "--input", "/root/testdata/sf0.001/documents.parquet",
             "--out", str(out), "--method", "exact", *extra],
            capture_output=True, text=True, timeout=240, cwd="/root/repo",
        )

    first = run_job()
    assert first.returncode == 0, first.stderr[-500:]
    rep1 = json.loads(first.stdout.strip().splitlines()[-1])
    assert rep1["shards_written"] == 1 and rep1["rows_written"] == 500

    second = run_job()
    rep2 = json.loads(second.stdout.strip().splitlines()[-1])
    assert rep2["shards_skipped"] == 1 and rep2["shards_written"] == 0
