"""Training-data stage: align_extractions + the two labels-file sinks.

write_labels_file (streaming, sort + iter_batches) must carry the same
content as render_labels_file (fixture-scale driver string) — the S2
format is order-insensitive, so parity is checked structurally:
{sentence: sorted tag lines}.
"""

import ray.data

from openie_with_entities_ray.stages.training import (
    align_extractions,
    render_labels_file,
    write_labels_file,
)


def _parse_blocks(text: str) -> dict:
    out = {}
    for block in text.strip("\n").split("\n\n"):
        lines = block.split("\n")
        sent = lines[0].replace(" [unused1] [unused2] [unused3]", "")
        out[sent] = sorted(lines[1:])
    return out


def test_streaming_labels_sink_matches_render(ray_session, tmp_path):
    rows = [
        {"sentence": "Alice founded Acme .",
         "extraction_line": "0.95 (Alice; founded; Acme)"},
        {"sentence": "Bob runs the team .",
         "extraction_line": "0.90 (Bob; runs; the team)"},
        {"sentence": "Alice founded Acme .",
         "extraction_line": "0.85 (Alice; founded; Acme)"},
        {"sentence": "broken line", "extraction_line": "not parseable"},
    ]
    ds = ray.data.from_items(rows)
    aligned = align_extractions(ds).materialize()

    rendered = render_labels_file(aligned)
    path = str(tmp_path / "out.labels")
    n = write_labels_file(aligned, path)

    got = _parse_blocks(open(path).read())
    want = _parse_blocks(rendered)
    assert got == want
    assert n == len(want) > 0
    # every block line count = 1 sentence line + >=1 tag rows
    for sent, tag_lines in got.items():
        assert tag_lines, sent
        for tl in tag_lines:
            # tags cover the sentence words plus the 3 [unused] markers
            assert len(tl.split()) == len(sent.split()) + 3, (sent, tl)
