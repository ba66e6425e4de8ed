"""Package the engine for spark-submit --py-files → dist/engine.zip."""

from __future__ import annotations

import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PACKAGES = ["pdf_extraction_api_spark", "refkernel", "fixtures"]


def main() -> str:
    dist = ROOT / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "engine.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for pkg in PACKAGES:
            for p in sorted((ROOT / pkg).rglob("*.py")):
                z.write(p, p.relative_to(ROOT))
    print(out)
    return str(out)


if __name__ == "__main__":
    main()
