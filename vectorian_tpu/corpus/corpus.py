"""Persistent corpus storage.

Reference: vectorian/corpus/corpus.py — a corpus directory holding
``corpus.h5`` (token tables per doc), ``corpus.db`` sqlite (full text keyed
by content hash, dedup via Document.find_duplicates, document.py:403-415),
per-normalization flavor caches (FlavorBuilder:68-192) and an embeddings
catalog (EmbeddingCatalog:195-242).

The same layout is kept (h5 + sqlite), minus the flavor h5 files: flavors
here are recomputed at session build (cheap vectorized numpy) and the heavy
artifacts — normalized embedding matrices and packed partition arrays — are
cached content-addressed under the cache home instead."""

from __future__ import annotations

import hashlib
import sqlite3
import tempfile
import uuid as uuid_mod
from pathlib import Path
from typing import Iterator, List, Optional

import numpy as np

from vectorian_tpu.corpus.document import Document
from vectorian_tpu.utils.progress import progress as _progress


def _sha256(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


class Corpus:
    """A persistent, deduplicating collection of documents."""

    def __init__(self, path):
        import h5py

        self._path = Path(path)
        self._path.mkdir(parents=True, exist_ok=True)
        self._db = sqlite3.connect(self._path / "corpus.db")
        self._db.execute(
            "CREATE TABLE IF NOT EXISTS text ("
            "unique_id TEXT PRIMARY KEY, content_hash TEXT, content TEXT)"
        )
        self._db.execute(
            "CREATE INDEX IF NOT EXISTS idx_hash ON text (content_hash)"
        )
        self._db.commit()
        self._h5 = h5py.File(self._path / "corpus.h5", "a")
        self._docs_grp = self._h5.require_group("documents")

    @property
    def path(self) -> Path:
        return self._path

    def __len__(self) -> int:
        return len(self._docs_grp)

    @property
    def uuids(self) -> List[str]:
        return list(self._docs_grp.keys())

    def find_duplicate(self, doc: Document) -> Optional[str]:
        """unique_id of an existing doc with identical text, if any
        (reference Document.find_duplicates, document.py:403-415)."""
        h = _sha256(doc.text)
        cur = self._db.execute(
            "SELECT unique_id, content FROM text WHERE content_hash=?", (h,)
        )
        for uid, content in cur.fetchall():
            if content == doc.text:
                return uid
        return None

    def add_doc(self, doc: Document) -> str:
        """Add (or dedup) a document; returns its unique id (reference
        corpus.py:383-407)."""
        existing = self.find_duplicate(doc)
        if existing is not None:
            return existing
        uid = str(uuid_mod.uuid4())
        doc.unique_id = uid
        # write the h5 token tables BEFORE committing the sqlite text row:
        # if anything fails mid-way, the h5 group is deleted so nothing
        # leaks (each retry uses a fresh uuid, so an orphan group would
        # never be revisited) and dedup never resolves the text to a
        # missing h5 group (an orphan db row would make the doc
        # un-addable)
        try:
            grp = self._docs_grp.create_group(uid)
            doc.save_to(grp)
            self._h5.flush()
            self._db.execute(
                "INSERT INTO text (unique_id, content_hash, content)"
                " VALUES (?,?,?)",
                (uid, _sha256(doc.text), doc.text),
            )
            self._db.commit()
        except Exception:
            if uid in self._docs_grp:
                del self._docs_grp[uid]
                self._h5.flush()
            raise
        return uid

    def get_doc(self, unique_id: str) -> Document:
        cur = self._db.execute(
            "SELECT content FROM text WHERE unique_id=?", (unique_id,)
        )
        row = cur.fetchone()
        if row is None:
            raise KeyError(unique_id)
        return Document.load_from(self._docs_grp[unique_id], row[0])

    def __iter__(self) -> Iterator[Document]:
        for uid in _progress(self.uuids, desc="loading corpus"):
            yield self.get_doc(uid)

    @property
    def docs(self) -> List[Document]:
        return list(self)

    def close(self):
        self._h5.close()
        self._db.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class TemporaryCorpus(Corpus):
    """Corpus in a temp directory (reference corpus.py:428)."""

    def __init__(self):
        self._tmp = tempfile.TemporaryDirectory(prefix="vectorian_tpu_corpus_")
        super().__init__(self._tmp.name)

    def close(self):
        super().close()
        self._tmp.cleanup()
