"""Regenerate tests/golden/*.json by running the reference Rust crate.

Usage: python tests/make_goldens.py
Requires cargo; run once, goldens are committed so pytest never needs Rust.
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from golden_corpora import CORPORA, pack  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parent.parent
GOLDEN_DIR = REPO / "tests" / "golden"
TOOL = REPO / "tools" / "golden_gen"
TARGET = "/tmp/golden_gen_target"


def main():
    subprocess.run(
        ["cargo", "build", "--release"],
        cwd=TOOL,
        env={
            "PATH": "/root/.cargo/bin:/usr/bin:/bin",
            "CARGO_TARGET_DIR": TARGET,
            # the reference crate denies warnings; newer toolchains add lints
            "RUSTFLAGS": "--cap-lints allow",
        },
        check=True,
    )
    binary = f"{TARGET}/release/golden_gen"
    GOLDEN_DIR.mkdir(exist_ok=True)
    for name, fn in CORPORA.items():
        lines = fn()
        inp = pathlib.Path(f"/tmp/golden_in_{name}.bin")
        inp.write_bytes(pack(lines))
        out = subprocess.run([binary, str(inp)], capture_output=True, text=True, check=True)
        data = json.loads(out.stdout)
        (GOLDEN_DIR / f"{name}.json").write_text(json.dumps(data))
        print(f"{name}: {len(lines)} lines, {len(data['lengths'])} symbols")


if __name__ == "__main__":
    main()
