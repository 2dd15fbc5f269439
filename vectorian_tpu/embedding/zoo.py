"""Named registry of pretrained embeddings.

Reference: vectorian/embedding/zoo.py — fasttext-LANG (+mini zenodo
variants), numberbatch-19.08-LANG, glove-6B/42B/840B/twitter
(Zoo._init:26-68, list/load:80-93).

This environment has zero network egress, so the zoo resolves names to
loaders over files in $VECTORIAN_CACHE_HOME; the canonical download URLs are
kept as metadata for deployments that can fetch."""

from __future__ import annotations

from typing import Dict, List

from vectorian_tpu.embedding.fasttext import PretrainedFastText
from vectorian_tpu.embedding.static import PretrainedGloVe, Word2VecVectors, cache_home


class Zoo:
    _entries: Dict[str, dict] = {}

    @staticmethod
    def _init():
        if Zoo._entries:
            return
        e = Zoo._entries
        for lang in ("en", "de", "fr", "es", "it", "nl", "pt", "ru", "zh"):
            e[f"fasttext-{lang}"] = {
                "factory": lambda lang=lang: PretrainedFastText(lang),
                "url": f"https://dl.fbaipublicfiles.com/fasttext/vectors-crawl/cc.{lang}.300.bin.gz",
            }
        for lang in ("en", "de"):
            e[f"numberbatch-19.08-{lang}"] = {
                "factory": lambda lang=lang: Word2VecVectors(
                    f"numberbatch-19.08-{lang}",
                    cache_home() / "numberbatch" / f"numberbatch-{lang}-19.08.txt",
                ),
                "url": "https://conceptnet.s3.amazonaws.com/downloads/2019/numberbatch/numberbatch-19.08.txt.gz",
            }
        for name, dims in (
            ("6B", (50, 100, 200, 300)),
            ("42B", (300,)),
            ("840B", (300,)),
            ("twitter.27B", (25, 50, 100, 200)),
        ):
            for d in dims:
                e[f"glove-{name}-{d}"] = {
                    "factory": lambda name=name, d=d: PretrainedGloVe(name, d),
                    "url": f"https://nlp.stanford.edu/data/glove.{name}.zip",
                }

    @staticmethod
    def list() -> List[str]:
        Zoo._init()
        return sorted(Zoo._entries.keys())

    @staticmethod
    def load(name: str):
        Zoo._init()
        entry = Zoo._entries.get(name)
        if entry is None:
            raise KeyError(
                f"unknown zoo embedding {name!r}; known: {Zoo.list()}"
            )
        return entry["factory"]()

    @staticmethod
    def url(name: str) -> str:
        Zoo._init()
        return Zoo._entries[name]["url"]
