"""Build the dqx-spark wheel with the stdlib only.

The standard path is ``pip wheel .`` / ``python -m build``; this exists for
hermetic environments where the ``wheel`` backend package is unavailable
(setuptools < 70 cannot bdist_wheel without it).  A wheel is a plain zip:
package files + ``*.dist-info/{METADATA,WHEEL,RECORD,entry_points.txt}``
(PEP 427); metadata is read from pyproject.toml so there is one source of
truth.

Usage: python scripts/build_wheel.py [outdir]   (default: dist/)
"""

from __future__ import annotations

import base64
import hashlib
import os
import sys
import tomllib
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _record_hash(data: bytes) -> str:
    return "sha256=" + base64.urlsafe_b64encode(hashlib.sha256(data).digest()).rstrip(b"=").decode()


def build(outdir: str) -> str:
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as fh:
        proj = tomllib.load(fh)["project"]
    name, version = proj["name"], proj["version"]
    dist = name.replace("-", "_")
    tag = "py3-none-any"
    wheel_name = f"{dist}-{version}-{tag}.whl"
    info_dir = f"{dist}-{version}.dist-info"

    metadata = [
        "Metadata-Version: 2.1",
        f"Name: {name}",
        f"Version: {version}",
        f"Summary: {proj['description']}",
        f"Requires-Python: {proj['requires-python']}",
        "License: Apache-2.0",
    ]
    for dep in proj.get("dependencies", []):
        metadata.append(f"Requires-Dist: {dep}")
    for extra, deps in proj.get("optional-dependencies", {}).items():
        metadata.append(f"Provides-Extra: {extra}")
        for dep in deps:
            metadata.append(f'Requires-Dist: {dep}; extra == "{extra}"')
    readme = os.path.join(ROOT, "README.md")
    metadata.append("Description-Content-Type: text/markdown")
    with open(readme, encoding="utf-8") as fh:
        body = fh.read()
    metadata_text = "\n".join(metadata) + "\n\n" + body

    entry_points = "[console_scripts]\n" + "\n".join(
        f"{k} = {v}" for k, v in proj.get("scripts", {}).items()
    ) + "\n"
    wheel_text = f"Wheel-Version: 1.0\nGenerator: dqx-spark-build\nRoot-Is-Purelib: true\nTag: {tag}\n"

    os.makedirs(outdir, exist_ok=True)
    out_path = os.path.join(outdir, wheel_name)
    record: list[tuple[str, str, int]] = []
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:

        def add(arcname: str, data: bytes) -> None:
            zf.writestr(zipfile.ZipInfo(arcname, (2020, 1, 1, 0, 0, 0)), data)
            record.append((arcname, _record_hash(data), len(data)))

        for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, "dqx_spark")):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for f in sorted(filenames):
                if f.endswith((".pyc", ".pyo")):
                    continue
                full = os.path.join(dirpath, f)
                arc = os.path.relpath(full, ROOT).replace(os.sep, "/")
                with open(full, "rb") as fh:
                    add(arc, fh.read())
        add(f"{info_dir}/METADATA", metadata_text.encode())
        add(f"{info_dir}/WHEEL", wheel_text.encode())
        add(f"{info_dir}/entry_points.txt", entry_points.encode())
        record_lines = [f"{p},{h},{n}" for p, h, n in record]
        record_lines.append(f"{info_dir}/RECORD,,")
        zf.writestr(zipfile.ZipInfo(f"{info_dir}/RECORD", (2020, 1, 1, 0, 0, 0)), "\n".join(record_lines) + "\n")
    return out_path


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "dist")))
