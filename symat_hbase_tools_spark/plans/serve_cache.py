"""Serve-many persist hygiene, shared by every operator that pins an
intermediate DataFrame per call (IVF probe tables, perceptual-hash
fingerprint tables, range-join interval tables, ...).

The pattern: a long-lived session calls the same operator repeatedly;
each call persists a small intermediate referenced more than once inside
ONE call's plan. Without explicit release the cached blocks accumulate
until the context cleaner happens to GC them. Each module keeps its OWN
process-scoped list (so caches from different operators never release
each other mid-plan) and calls ``release_all`` on it before pinning a new
entry — outstanding state is bounded at one call's worth per operator.

Callers materialize each result before issuing the next call (the CLI /
entry / bench paths all do), so the released cache is no longer
referenced by a live plan.
"""

from __future__ import annotations


def release_all(caches: list) -> None:
    """Unpersist and drop every DataFrame in ``caches`` (in place)."""
    while caches:
        prev = caches.pop()
        try:
            prev.unpersist(blocking=False)
        except Exception:
            # the session that persisted it was stopped — its cached
            # blocks died with the context; a throw here would wedge
            # the next call in the NEW session until process restart
            pass
