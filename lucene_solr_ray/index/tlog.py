"""Transaction log (UpdateLog) + CDCR cross-cluster forwarding.

Reference semantics:

- ``UpdateLog`` (``solr/core/src/java/org/apache/solr/update/
  UpdateLog.java:74,414,458,815``): every add / delete / atomic update is
  written to a transaction log BEFORE being applied; after a crash,
  ``recoverFromLog`` replays the un-committed tail so the index converges
  to the pre-crash state. Adds replay through the uniqueKey overwrite
  path (updateDocument), which makes re-application after a
  crash-between-apply-and-mark idempotent.

- ``CdcrReplicator`` (``solr/core/src/java/org/apache/solr/handler/
  CdcrReplicator.java:42-130``): a source cluster forwards its update log
  to a target cluster in batches, one op stream per target, each target
  tracking its own log-position checkpoint; deletes flush the pending add
  batch so cross-op ordering is preserved.

Ray-native mapping: the log is a directory of atomically-renamed entry
files (``tlog/tlog.<version>.json`` + a parquet payload for adds) beside
the index manifest; entries are keyed by (conv_id, turn_idx) — never by
doc_id, which differs between clusters — so a forwarded op means the same
thing on the target. Replay/forward call the SAME public update surface
(``update_index`` / ``delete_documents`` / ``atomic_update``), i.e. the
log is a WAL over the existing operators, not a second write path.

Idempotence: ``add`` replays with overwrite=True (uniqueKey semantics),
``delete``/``set``/``remove`` are naturally idempotent, and ``inc`` ops
are resolved to their post-image ``set`` AT LOG TIME (physical logging) —
so every entry can be safely re-applied when a crash lands between apply
and the applied-marker rename. Solr gets the same property from per-doc
``_version_`` tracking; post-image logging is the equivalent without a
per-doc version column.

Scale: one entry per update BATCH (not per doc); payloads are parquet
written once and streamed back through ``read_parquet`` at replay, so a
resumed 100-TB ingest replays block-by-block with the same streaming
executor as the original apply.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

import pyarrow as pa

import ray.data as rd

from .build import read_manifest
from .update import atomic_update, delete_documents, realtime_get, \
    update_index

TLOG_DIR = "tlog"


class UpdateLog:
    """Append-only versioned op log for one index directory."""

    def __init__(self, index_dir: str):
        self.index_dir = str(index_dir)
        self.path = Path(index_dir) / TLOG_DIR
        self.path.mkdir(exist_ok=True)

    def _entry_path(self, version: int) -> Path:
        return self.path / f"tlog.{version:010d}.json"

    def _payload_path(self, version: int) -> Path:
        return self.path / f"tlog.{version:010d}.parquet"

    def _applied_path(self, version: int) -> Path:
        return self.path / f"tlog.{version:010d}.applied"

    def last_version(self) -> int:
        versions = [int(p.name.split(".")[1])
                    for p in self.path.glob("tlog.*.json")]
        return max(versions, default=0)

    def append(self, op: dict, payload: pa.Table | str | None = None) -> int:
        """Write one entry atomically (payload first, then the entry
        rename publishes it — same two-phase order as the manifest)."""
        version = self.last_version() + 1
        if payload is not None:
            ppath = self._payload_path(version)
            tmp = ppath.with_suffix(".tmp")
            if isinstance(payload, str):
                src = Path(payload)
                if src.is_dir():
                    # normalize a parquet dir into one durable log payload
                    import pyarrow.dataset as pads
                    import pyarrow.parquet as pq
                    pq.write_table(pads.dataset(str(src)).to_table(), tmp)
                else:
                    shutil.copyfile(src, tmp)
            else:
                import pyarrow.parquet as pq
                pq.write_table(payload, tmp)
            os.replace(tmp, ppath)
            op = {**op, "payload": ppath.name}
        entry = self._entry_path(version)
        tmp = entry.with_suffix(".tmp")
        tmp.write_text(json.dumps({"version": version, **op}))
        os.replace(tmp, entry)
        return version

    def _intent_path(self, version: int) -> Path:
        return self.path / f"tlog.{version:010d}.applying"

    def mark_applied(self, version: int) -> None:
        tmp = self._applied_path(version).with_suffix(".tmp")
        tmp.write_text("")
        os.replace(tmp, self._applied_path(version))
        self._intent_path(version).unlink(missing_ok=True)

    def entries(self, after: int = 0) -> list[dict]:
        out = []
        for p in sorted(self.path.glob("tlog.*.json")):
            e = json.loads(p.read_text())
            if e["version"] > after:
                out.append(e)
        return out

    def unapplied(self) -> list[dict]:
        return [e for e in self.entries()
                if not self._applied_path(e["version"]).exists()]

    def apply_entry(self, entry: dict, **add_kwargs) -> bool:
        """Apply one entry exactly-once through the public update surface
        and mark it applied. Returns False when the entry turns out to
        have already been applied (crash between apply and mark).

        Exactly-once mechanism: an *apply intent* file recording the
        pre-apply manifest version is renamed into place BEFORE the op
        runs. The ops themselves publish atomically (two-phase manifest
        rename, version+1), so at recovery the ambiguity of a missing
        applied-marker resolves by comparing the live manifest version
        with the intent: advanced ⇒ the apply completed ⇒ mark only.
        This is the role Solr's per-doc ``_version_`` check plays in
        LogReplayer (UpdateLog.java:815), done at batch granularity —
        valid under the same single-update-owner assumption as the
        reference's leader-only tlog writes."""
        version = entry["version"]
        intent = self._intent_path(version)
        if intent.exists():
            pre = json.loads(intent.read_text())["manifest_version"]
            if read_manifest(self.index_dir)["version"] > pre:
                self.mark_applied(version)
                return False
        else:
            tmp = intent.with_suffix(".tmp")
            tmp.write_text(json.dumps({
                "manifest_version":
                    read_manifest(self.index_dir)["version"]}))
            os.replace(tmp, intent)
        op = entry["op"]
        if op == "add":
            update_index(self.index_dir, str(self.path / entry["payload"]),
                         overwrite=bool(entry.get("overwrite")),
                         **add_kwargs)
        elif op == "delete":
            delete_documents(self.index_dir,
                             keys=[tuple(k) for k in entry["keys"]])
        elif op == "atomic":
            atomic_update(self.index_dir, entry["updates"])
        else:
            raise ValueError(f"unknown tlog op {op!r}")
        self.mark_applied(version)
        return True


def _keys_for_doc_ids(index_dir: str, doc_ids) -> list[tuple[str, int]]:
    t = realtime_get(index_dir, doc_ids=[int(d) for d in doc_ids])
    if t is None or t.num_rows < len(set(int(d) for d in doc_ids)):
        raise KeyError("delete by doc_id on unknown documents")
    return [(str(r["conv_id"]), int(r["turn_idx"])) for r in t.to_pylist()]


def _resolve_inc_ops(index_dir: str, updates: list[dict]) -> list[dict]:
    """Rewrite {'inc': d} ops to their post-image {'set': v+d} so the
    logged entry is idempotent (see module docstring)."""
    keys = [(str(u["conv_id"]), int(u["turn_idx"])) for u in updates]
    need = [k for u, k in zip(updates, keys)
            if any(isinstance(v, dict) and "inc" in v for f, v in u.items()
                   if f not in ("conv_id", "turn_idx"))]
    current = {}
    if need:
        t = realtime_get(index_dir, keys=need)
        if t is not None:
            current = {(str(r["conv_id"]), int(r["turn_idx"])): r
                       for r in t.to_pylist()}
    out = []
    for u, k in zip(updates, keys):
        nu = {}
        for f, v in u.items():
            if isinstance(v, dict) and "inc" in v:
                if k not in current:
                    raise KeyError(f"atomic inc on missing document {k}")
                base = current[k].get(f) or 0
                nu[f] = {"set": base + v["inc"]}
            else:
                nu[f] = v
        out.append(nu)
    return out


def logged_add(index_dir: str, source: str | rd.Dataset | pa.Table, *,
               overwrite: bool = False, **kw) -> dict:
    """update_index with write-ahead logging (UpdateLog.add analog)."""
    log = UpdateLog(index_dir)
    # normalize the input to one durable log payload; a parquet path is
    # copied byte-for-byte, a Dataset/Table is written once
    if isinstance(source, rd.Dataset):
        payload: pa.Table | str = pa.concat_tables(
            [pa.Table.from_batches([b])
             for b in source.iter_batches(batch_format="pyarrow")])
    elif isinstance(source, pa.Table):
        payload = source
    else:
        payload = str(source)
    version = log.append({"op": "add", "overwrite": bool(overwrite)},
                         payload=payload)
    # apply FROM the durable log payload (what was logged is what runs)
    log.apply_entry({"version": version, "op": "add",
                     "overwrite": bool(overwrite),
                     "payload": log._payload_path(version).name}, **kw)
    return read_manifest(index_dir)


def logged_delete(index_dir: str, doc_ids=None, keys=None) -> dict:
    """delete_documents with write-ahead logging; doc_ids are resolved to
    (conv_id, turn_idx) keys at log time (doc_ids are cluster-local and
    meaningless to a CDCR target)."""
    log = UpdateLog(index_dir)
    all_keys = [(str(c), int(t)) for c, t in (keys or [])]
    if doc_ids:
        all_keys += _keys_for_doc_ids(index_dir, doc_ids)
    version = log.append({"op": "delete", "keys": all_keys})
    log.apply_entry({"version": version, "op": "delete",
                     "keys": all_keys})
    return read_manifest(index_dir)


def logged_atomic_update(index_dir: str, updates: list[dict]) -> dict:
    """atomic_update with write-ahead logging; inc ops are logged as
    their post-image set (idempotent replay)."""
    log = UpdateLog(index_dir)
    resolved = _resolve_inc_ops(index_dir, updates)
    version = log.append({"op": "atomic", "updates": resolved})
    log.apply_entry({"version": version, "op": "atomic",
                     "updates": resolved})
    return read_manifest(index_dir)


def recover_from_log(index_dir: str) -> dict:
    """Replay the un-applied log tail in version order
    (UpdateLog.recoverFromLog:815 / LogReplayer). Returns a RecoveryInfo
    analog: counts per op kind + the replayed versions."""
    log = UpdateLog(index_dir)
    info = {"adds": 0, "deletes": 0, "atomics": 0, "replayed": [],
            "already_applied": []}
    for entry in log.unapplied():
        ran = log.apply_entry(entry)
        if not ran:
            info["already_applied"].append(entry["version"])
            continue
        kind = {"add": "adds", "delete": "deletes",
                "atomic": "atomics"}[entry["op"]]
        info[kind] += 1
        info["replayed"].append(entry["version"])
    return info


def _checkpoint_path(target_dir: str) -> Path:
    return Path(target_dir) / "cdcr_checkpoint.json"


def cdcr_bootstrap(source_dir: str, target_dir: str) -> dict:
    """Bootstrap a CDCR target: copy the source index and record the
    source log position, so forwarding starts from 'now' (the reference's
    bootstrap + checkpoint init)."""
    src, dst = Path(source_dir), Path(target_dir)
    if dst.exists():
        raise FileExistsError(f"target {target_dir} already exists")
    shutil.copytree(src, dst)
    ckpt = UpdateLog(source_dir).last_version()
    tmp = _checkpoint_path(target_dir).with_suffix(".tmp")
    tmp.write_text(json.dumps({"source_version": ckpt}))
    os.replace(tmp, _checkpoint_path(target_dir))
    return {"checkpoint": ckpt}


def cdcr_forward(source_dir: str, target_dir: str) -> dict:
    """Forward source log entries past the target's checkpoint to the
    target index (CdcrReplicator.run analog). Ops apply in version order
    through the same public update surface; adds forward with
    overwrite=True (CdcrUpdateProcessor keep-version analog: uniqueKey
    decides identity on the target). The checkpoint advances after each
    entry, so a crashed forward resumes without re-reading."""
    src_log = UpdateLog(source_dir)
    ckpt_file = _checkpoint_path(target_dir)
    ckpt = (json.loads(ckpt_file.read_text())["source_version"]
            if ckpt_file.exists() else 0)
    forwarded = {"adds": 0, "deletes": 0, "atomics": 0, "from": ckpt}
    for entry in src_log.entries(after=ckpt):
        op = entry["op"]
        if op == "add":
            update_index(target_dir,
                         str(src_log.path / entry["payload"]),
                         overwrite=True)
            forwarded["adds"] += 1
        elif op == "delete":
            delete_documents(target_dir,
                             keys=[tuple(k) for k in entry["keys"]])
            forwarded["deletes"] += 1
        elif op == "atomic":
            atomic_update(target_dir, entry["updates"])
            forwarded["atomics"] += 1
        else:
            raise ValueError(f"unknown tlog op {op!r}")
        tmp = ckpt_file.with_suffix(".tmp")
        tmp.write_text(json.dumps({"source_version": entry["version"]}))
        os.replace(tmp, ckpt_file)
        ckpt = entry["version"]
    forwarded["to"] = ckpt
    return forwarded


def log_status(index_dir: str) -> dict:
    """CDCR/UpdateLog admin view (CdcrRequestHandler status analog)."""
    log = UpdateLog(index_dir)
    entries = log.entries()
    return {
        "entries": len(entries),
        "last_version": log.last_version(),
        "unapplied": [e["version"] for e in log.unapplied()],
        "manifest_version": read_manifest(index_dir)["version"],
    }
