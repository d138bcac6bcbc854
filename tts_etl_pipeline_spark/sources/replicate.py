"""Incremental cross-location replication of versioned tables — the
disaster-recovery / region-mirror primitive.

clone_table (versioned.py) zero-copies ONE snapshot into a new table
with a fresh lineage; a REPLICA is the opposite contract: the full
version history, byte-identical manifests, synced repeatedly and
INCREMENTALLY — each sync ships only the versions (and the data files /
sidecars they newly reference) that appeared since the last sync, which
is exactly what immutable data files and content-addressed sidecars
make possible. A day's sync of a 100 TB table costs that day's commits.

Mechanics: manifests are the recovery unit. For every source version
past the replica's head, a generic reference walker collects every rel
path the manifest names — data files (`data/...`), shard sidecars,
bloom/DV/equality-delete sidecars (`_versions/...`), including refs
NESTED inside shard payloads — and copies the missing ones (hard-link
on the same filesystem, the clone_table rule). The manifest file itself
is copied VERBATIM last, and `_latest` advances only after its version's
full closure is present, so a killed sync leaves a valid replica at the
last completed version, never a torn one. Sidecar names are
content-addressed, so "same name == same bytes" and re-syncs skip them
by existence alone.

Guards:
- the replica must genuinely be a replica: before syncing, the byte
  content of the replica's head manifest must equal the source's same
  version — a diverged destination refuses TYPED (ReplicaDivergedError)
  instead of silently interleaving two histories;
- a source version whose data files were vacuumed away refuses TYPED
  (names the missing file) — replicating a hole would produce a replica
  that cannot serve its own history;
- refs (branches/tags + staged branch manifests) replicate as a closure
  too, so a WAP branch staged on the source survives failover.

Pins: tests/test_replicate.py (incremental delta-only sync, time-travel
equality at every version, divergence/vacuum refusals, branch closure),
driver query ★j37 (oracle = plain SQL over the final state; the replica
serves it byte-for-byte)."""

from __future__ import annotations

import json
import os
import shutil

from tts_etl_pipeline_spark.sources import versioned as V


class ReplicaDivergedError(RuntimeError):
    """The destination holds a version whose manifest differs from the
    source's same-numbered version: it is not (or no longer) a replica of
    this source. Re-point the sync or recreate the replica."""


def _collect_refs(obj, out: set) -> None:
    """Walk any JSON-shaped value, collecting every rel path a manifest
    can reference ('data/...' files, '_versions/...' sidecars)."""
    if isinstance(obj, str):
        if obj.startswith("data/") or obj.startswith("_versions/"):
            out.add(obj)
    elif isinstance(obj, dict):
        for k, v in obj.items():
            _collect_refs(k, out)
            _collect_refs(v, out)
    elif isinstance(obj, (list, tuple)):
        for v in obj:
            _collect_refs(v, out)


def _closure(src: str, seed_payload) -> set:
    """All rel paths reachable from `seed_payload`: direct references plus
    references nested inside referenced _versions/ JSON sidecars (shard
    payloads name their files' bloom/DV sidecars)."""
    out: set = set()
    _collect_refs(seed_payload, out)
    work = [r for r in out if r.startswith("_versions/") and r.endswith(".json")]
    seen = set(work)
    while work:
        rel = work.pop()
        full = os.path.join(src, rel)
        try:
            with open(full, encoding="utf-8") as fh:
                payload = json.load(fh)
        except FileNotFoundError:
            continue  # absence is caught by the copy step's typed check
        before = set(out)
        _collect_refs(payload, out)
        for r in out - before:
            if (
                r.startswith("_versions/")
                and r.endswith(".json")
                and r not in seen
            ):
                seen.add(r)
                work.append(r)
    return out


def _copy_one(src: str, dst: str, rel: str) -> int:
    """Copy `rel` if absent at dst (immutable, content-addressed: name
    equality is identity). Returns bytes copied (0 = already present).
    Hard-link when possible — a same-filesystem replica shares storage."""
    s, d = os.path.join(src, rel), os.path.join(dst, rel)
    if os.path.exists(d):
        return 0
    if not os.path.exists(s):
        raise ValueError(
            f"source is missing {rel!r} (vacuumed?): this version can no "
            "longer be replicated in full — sync from a later version or "
            "restore the source"
        )
    os.makedirs(os.path.dirname(d), exist_ok=True)
    tmp = d + ".tmp-repl"
    try:
        os.link(s, tmp)
    except OSError:
        shutil.copy2(s, tmp)  # cross-device: copy instead
    os.replace(tmp, d)
    return os.path.getsize(d)


def _manifest_bytes(root: str, v: int) -> bytes | None:
    try:
        with open(V._manifest_path(root, v), "rb") as fh:
            return fh.read()
    except FileNotFoundError:
        return None


def replicate(src: str, dst: str, include_refs: bool = True) -> dict:
    """Sync the replica at `dst` to the source head. Returns a report:
    {versions_synced, files_copied, bytes_copied, files_skipped}.
    Idempotent — a second call syncs nothing."""
    src_head = V.current_version(src)
    if src_head == 0:
        raise ValueError(f"nothing to replicate: no versions at {src}")
    dst_head = V.current_version(dst) if os.path.isdir(V._vdir(dst)) else 0
    if dst_head > 0:
        a = _manifest_bytes(src, dst_head)
        b = _manifest_bytes(dst, dst_head)
        if a is None or a != b:
            raise ReplicaDivergedError(
                f"destination head v{dst_head} does not match the source's "
                f"manifest for the same version — {dst!r} is not a replica "
                f"of {src!r}"
            )
    report = {
        "versions_synced": 0,
        "files_copied": 0,
        "bytes_copied": 0,
        "files_skipped": 0,
    }

    def _ship(seed_payload) -> None:
        for rel in sorted(_closure(src, seed_payload)):
            n = _copy_one(src, dst, rel)
            if n:
                report["files_copied"] += 1
                report["bytes_copied"] += n
            else:
                report["files_skipped"] += 1

    for v in range(dst_head + 1, src_head + 1):
        raw = _manifest_bytes(src, v)
        if raw is None:
            raise ValueError(
                f"source manifest v{v} is missing (vacuumed?): cannot "
                "replicate a lineage with holes"
            )
        _ship(json.loads(raw))
        # the manifest lands LAST, then the pointer: a killed sync leaves
        # a valid replica at the previous completed version
        mdst = V._manifest_path(dst, v)
        os.makedirs(os.path.dirname(mdst), exist_ok=True)
        tmp = mdst + ".tmp-repl"
        with open(tmp, "wb") as fh:
            fh.write(raw)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, mdst)
        V._write_atomic(
            os.path.join(V._vdir(dst), "_latest.json"), {"version": v}
        )
        report["versions_synced"] += 1

    if include_refs:
        refs_src = V._refs_path(src)
        if os.path.exists(refs_src):
            with open(refs_src, encoding="utf-8") as fh:
                refs = json.load(fh)
            # staged branch manifests + their payload closure first, the
            # refs pointer last (same valid-at-every-step discipline)
            for name, info in (refs.get("branches") or {}).items():
                bv = info["fork"] + 1
                while True:  # scan, don't trust the head CACHE (it lags)
                    brel = os.path.relpath(
                        V._branch_manifest_file(src, bv, name), src
                    )
                    bsrc = os.path.join(src, brel)
                    if not os.path.exists(bsrc):
                        break
                    with open(bsrc, encoding="utf-8") as fh:
                        _ship(json.load(fh))
                    n = _copy_one(src, dst, brel)
                    if n:
                        report["files_copied"] += 1
                        report["bytes_copied"] += n
                    else:
                        report["files_skipped"] += 1
                    bv += 1
            V._write_atomic(V._refs_path(dst), refs)
    return report
