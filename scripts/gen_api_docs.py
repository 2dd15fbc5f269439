"""Generate the markdown API reference under docs/api/ from live
introspection (signatures + docstrings) — the counterpart of the
reference's pdoc/mkdocs site (reference mkdocs/docs/*.md), with no
external doc tooling (none is installed in this image; stdlib inspect
only).

Usage: python scripts/gen_api_docs.py   (writes docs/api/*.md + index)
"""

import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

MODULES = [
    ("vectorian_tpu", "Top-level package"),
    ("vectorian_tpu.session", "Sessions, partitions, results"),
    ("vectorian_tpu.index", "Queries, indexes, matches"),
    ("vectorian_tpu.alignment", "Alignment / transport optimizer specs"),
    ("vectorian_tpu.metrics", "Metric facade"),
    ("vectorian_tpu.sim.token", "Token similarities"),
    ("vectorian_tpu.sim.span", "Span similarities"),
    ("vectorian_tpu.sim.vector", "Vector similarities"),
    ("vectorian_tpu.sim.kernel", "Scalar kernels"),
    ("vectorian_tpu.sim.modifier", "Token-similarity modifiers"),
    ("vectorian_tpu.embedding.static", "Static embeddings"),
    ("vectorian_tpu.embedding.contextual", "Contextual embeddings"),
    ("vectorian_tpu.embedding.fasttext", "fastText (native/compressed)"),
    ("vectorian_tpu.embedding.span", "Span embeddings"),
    ("vectorian_tpu.embedding.zoo", "Embedding zoo"),
    ("vectorian_tpu.embedding.vectors", "Vector containers"),
    ("vectorian_tpu.embedding.transform", "Vector transforms (PCA)"),
    ("vectorian_tpu.corpus.document", "Documents, tokens, spans"),
    ("vectorian_tpu.corpus.corpus", "Corpus storage"),
    ("vectorian_tpu.corpus.packing", "Corpus packing"),
    ("vectorian_tpu.normalization", "Normalization flavors"),
    ("vectorian_tpu.importers", "Importers / NLP protocol"),
    ("vectorian_tpu.interact", "Interactive GUI"),
    ("vectorian_tpu.render", "Result renderers"),
    ("vectorian_tpu.parallel.mesh", "Multi-chip mesh search"),
    ("vectorian_tpu.saliency", "Keyword saliency boosters"),
    ("vectorian_tpu.utils.progress", "Progress reporting"),
]


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj, limit=None) -> str:
    d = inspect.getdoc(obj) or ""
    if limit and d:
        d = d.split("\n\n")[0]
    return d


def render_module(name: str, blurb: str) -> str:
    mod = importlib.import_module(name)
    out = [f"# `{name}`", ""]
    md = _doc(mod)
    if md:
        out += [md, ""]
    members = getattr(mod, "__all__", None)
    if members is None:
        members = [
            n for n, o in vars(mod).items()
            if not n.startswith("_")
            and (inspect.isclass(o) or inspect.isfunction(o))
            and getattr(o, "__module__", None) == name
        ]
    for n in members:
        obj = getattr(mod, n, None)
        if obj is None:
            continue
        if inspect.isclass(obj):
            out.append(f"## class `{n}{_sig(obj)}`")
            d = _doc(obj)
            if d:
                out += ["", d, ""]
            for mn, mo in sorted(vars(obj).items()):
                if mn.startswith("_"):
                    continue
                if isinstance(mo, property):
                    pd = _doc(mo.fget, limit=True)
                    out.append(f"- **{mn}** *(property)*"
                               + (f" — {pd.splitlines()[0]}" if pd else ""))
                elif inspect.isfunction(mo) or isinstance(
                    mo, (staticmethod, classmethod)
                ):
                    fn = mo.__func__ if not inspect.isfunction(mo) else mo
                    fd = _doc(fn, limit=True)
                    out.append(
                        f"- **{mn}**`{_sig(fn)}`"
                        + (f" — {fd.splitlines()[0]}" if fd else "")
                    )
            out.append("")
        elif inspect.isfunction(obj):
            out.append(f"## `{n}{_sig(obj)}`")
            d = _doc(obj, limit=True)
            if d:
                out += ["", d, ""]
    return "\n".join(out) + "\n"


def main():
    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "api",
    )
    os.makedirs(base, exist_ok=True)
    index = [
        "# API reference",
        "",
        "Generated from live signatures/docstrings by "
        "`scripts/gen_api_docs.py` (re-run after API changes).",
        "",
    ]
    for name, blurb in MODULES:
        fname = name.replace("vectorian_tpu", "vt").replace(".", "_") + ".md"
        try:
            text = render_module(name, blurb)
        except Exception as e:  # noqa: BLE001
            print(f"skip {name}: {e}", file=sys.stderr)
            continue
        with open(os.path.join(base, fname), "w") as f:
            f.write(text)
        index.append(f"- [`{name}`]({fname}) — {blurb}")
    with open(os.path.join(base, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print(f"wrote {len(MODULES)} module pages under docs/api/")


if __name__ == "__main__":
    main()
