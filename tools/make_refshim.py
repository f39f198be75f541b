"""Recreate the in-process reference shim under /tmp/refshim: a copy of
/root/reference/src with the ``piscina`` worker-pool import replaced by
an in-process class running the lexer on the main thread (the sandbox
has no network to install piscina; the patch is purely mechanical).

Usage: python tools/make_refshim.py [shim_dir]
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

REF_SRC = Path("/root/reference/src")

SHIM = '''\
// In-process replacement for the piscina worker pool: runs the lexer
// directly on the main thread. Only the surface parseTemplate.js uses.
import { lex } from "./lexer.js";
export default class Piscina {
  constructor(_opts) {}
  run(payload, _opts) {
    return lex(payload);
  }
}
'''


def make(shim_dir: str | Path = "/tmp/refshim") -> Path:
    out = Path(shim_dir)
    out.mkdir(parents=True, exist_ok=True)
    for f in REF_SRC.glob("*.js"):
        shutil.copy(f, out / f.name)
    pt = out / "parseTemplate.js"
    pt.write_text(pt.read_text().replace(
        'import Piscina from "piscina";',
        'import Piscina from "./piscina_shim.js";'))
    (out / "piscina_shim.js").write_text(SHIM)
    return out


if __name__ == "__main__":
    print(make(sys.argv[1] if len(sys.argv) > 1 else "/tmp/refshim"))
