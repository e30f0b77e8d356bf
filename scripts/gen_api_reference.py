"""Generate doc/api_reference.md: the full public API surface.

Counterpart of the reference's autosummary-driven API index
(/root/reference/doc/source/modules/api.rst) — walks every public module,
lists each exported class/function with its signature and the first
paragraph of its docstring. Run after API changes:

    PYTHONPATH= JAX_PLATFORMS=cpu python scripts/gen_api_reference.py
"""

import importlib
import inspect
import sys
import textwrap
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

MODULES = [
    ("neuraloperator_tpu", "Top level"),
    ("neuraloperator_tpu.models", "Models"),
    ("neuraloperator_tpu.layers", "Layers"),
    ("neuraloperator_tpu.losses", "Losses"),
    ("neuraloperator_tpu.data.datasets", "Datasets"),
    ("neuraloperator_tpu.data.transforms", "Data transforms"),
    ("neuraloperator_tpu.training", "Training"),
    ("neuraloperator_tpu.parallel", "Parallel / distributed"),
    ("neuraloperator_tpu.serving", "Serving"),
    ("neuraloperator_tpu.ops", "Ops (spectral primitives)"),
    ("neuraloperator_tpu.config", "Config"),
    ("neuraloperator_tpu.utils", "Utilities"),
]


def _public_names(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
    out = []
    for n in sorted(set(names)):
        obj = getattr(mod, n, None)
        if obj is None or inspect.ismodule(obj):
            continue
        if not (inspect.isclass(obj) or callable(obj)):
            continue
        out.append((n, obj))
    return out


def _first_paragraph(obj):
    doc = inspect.getdoc(obj) or ""
    para = doc.split("\n\n")[0].replace("\n", " ").strip()
    return textwrap.shorten(para, width=300, placeholder=" …")


def _signature(obj):
    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        return ""
    if len(sig) > 120:
        sig = sig[:117] + "...)"
    return sig


def main():
    lines = [
        "# API reference (generated)",
        "",
        "Every public class and function, with its signature and summary.",
        "Regenerate with `python scripts/gen_api_reference.py`. The",
        "reference-counterpart mapping (which `neuralop` symbol each of",
        "these replaces) lives in [api.md](api.md); design rationale in",
        "[tpu_design.md](tpu_design.md).",
        "",
    ]
    seen_total = 0
    for modname, title in MODULES:
        mod = importlib.import_module(modname)
        entries = _public_names(mod)
        if not entries:
            continue
        lines += [f"## {title} — `{modname}`", ""]
        for name, obj in entries:
            kind = "class" if inspect.isclass(obj) else "function"
            sig = _signature(obj)
            summary = _first_paragraph(obj)
            lines.append(f"### `{name}{sig}`")
            lines.append("")
            lines.append(f"*{kind}* — {summary or '(no docstring)'}")
            lines.append("")
            seen_total += 1
    out = Path(__file__).parent.parent / "doc" / "api_reference.md"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out} ({seen_total} symbols, {len(lines)} lines)")


if __name__ == "__main__":
    main()
