"""One-off differential check: run-wise tokenizer vs the previous
char-wise implementation (pulled from git HEAD) over the synth corpus
plus adversarial and random tag-soup inputs. Not a pytest module (name
avoids collection); invoked manually during the round-3 rewrite."""

import random
import subprocess
import sys
import types

sys.path.insert(0, ".")

import duckdb

from onnxocr_ray_spark.kernels.html import tokenize_blocks
from onnxocr_ray_spark.sources.pages import synth_page


def fields(bs):
    return [
        (b.raw, b.line0, b.line1, b.col0, b.width_chars,
         b.text_chars, b.link_chars, b.n_tags, b.order)
        for b in bs
    ]


def main(old_ref: str = "HEAD") -> None:
    old_src = subprocess.run(
        ["git", "show", f"{old_ref}:onnxocr_ray_spark/kernels/html.py"],
        capture_output=True, text=True,
    ).stdout
    old_mod = types.ModuleType("old_html")
    sys.modules["old_html"] = old_mod  # dataclass decorator looks it up
    exec(old_src, old_mod.__dict__)

    cases = []
    rows = duckdb.sql(
        "SELECT doc_id, text, lang FROM '/root/testdata/sf0.01/documents.parquet'"
    ).fetchall()
    for d, t, l in rows:
        cases.append(synth_page(int(d), t or "", l).decode("utf-8", errors="ignore"))
    nl = chr(10)
    tab = chr(9)
    vt = chr(11)
    nbsp = chr(0xA0)
    ideo = chr(0x3000)
    cases += [
        "", "   ", nl * 3, "a", "a" + nl + "b", "  a  " + nl + "  b  ",
        "<p>ab<b>cd</b>ef</p>", "<p>ab <b>cd</b>" + nl + "cd</p>",
        "x" * 5000, ("word " * 200 + nl) * 30,
        "<p>  spaced" + nbsp + "out" + ideo + "text</p>",
        "<p>run<a>on</a>run</p>", "<a>link" + nl + "second</a> tail",
        "<p>tab" + tab + "here" + vt + "a vt fs</p>",
        "t<i>a</i>i<i>l</i>s" + nl + "<p>z</p>",
        "a<b>" + nl + "b</b>c", "<p>" + nl + " x</p>",
    ]
    rng = random.Random(7)
    alphabet = list("ab <>/pin" + nl + tab + " ")
    for _ in range(500):
        cases.append(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 200)))
        )
    bad = 0
    for c in cases:
        a = fields(tokenize_blocks(c))
        b = fields(old_mod.tokenize_blocks(c))
        if a != b:
            bad += 1
            print("MISMATCH on", repr(c[:80]))
            print(" new:", a[:3])
            print(" old:", b[:3])
            if bad > 3:
                break
    print("cases:", len(cases), "mismatches:", bad)
    assert bad == 0


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "HEAD")
