"""Execution-context helpers for shuffle-terminated Dataset pipelines.

``unreserved_execution`` — scoped disable of Ray Data's per-operator
resource reservation (``DataContext.op_resource_reservation_enabled``)
for pipelines whose plan is ``map -> all-to-all (groupby/sort) ->
small-output reduce``.

Why: Ray Data's ``ReservationOpResourceAllocator`` splits the CPU
budget across every operator in the plan (50% reservation ratio by
default, divided per op).  A blocking ``AllToAllOperator`` (every
``groupby``/``sort``) cannot consume its share while its upstream map
is still producing, so the map stage runs at roughly ``1/num_ops`` of
the cluster: measured on this code's index build (map tokenize ->
groupby segment-build), the map stage got exactly ONE in-flight task
at ``num_cpus=4`` (96.8 s of task CPU over 96.9 s wall — strictly
serial; task start gaps equal task duration) and ~50% utilization at
16/32 CPUs.  A synthetic 32x1s-task repro measured 34.3 s with the
default allocator vs 8.2 s (ideal) with reservation disabled.

Safety: the reservation exists to backpressure long streaming chains
so one operator cannot flood the object store.  For a pipeline that
ENDS in an all-to-all, the sort barrier materializes the map's entire
output in the object store regardless of allocator policy, so
disabling reservation does not change peak memory — it only lets the
map phase use the CPUs the idle sort operator was holding.  Do NOT use
this around long multi-stage streaming chains (e.g. chained joins) or
actor-pool stages; their backpressure is load-bearing.

The flag is read when an execution starts, so the context must wrap
the call that DRAINS the dataset (``iter_rows``/``take_all``/
``to_pandas``/``materialize``), not just the lazy plan construction.
"""
from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def unreserved_execution(*datasets):
    """Scoped ``DataContext.op_resource_reservation_enabled = False``.

    Ray Data SNAPSHOTS the ambient ``DataContext`` into every dataset at
    creation time and executes with that copy, so flipping the global
    context after the plan exists is a no-op.  Pass the dataset(s) about
    to be drained and their captured contexts are patched too (and
    restored on exit).  No-op on Ray versions without the attribute.

    The ambient context is patched as well because datasets *derived
    inside* the scope (e.g. a ``groupby`` issued during the drain)
    snapshot it at creation.  That makes this scope a process-wide side
    effect: a dataset created concurrently on another thread while the
    drain runs would capture reservation-disabled permanently.  Call
    sites (``index/build.py``) therefore assume no concurrent dataset
    creation during a build drain — builds are single-threaded per
    process by contract.
    """
    targets = []
    try:
        from ray.data import DataContext

        ctxs = [DataContext.get_current()]
    except Exception:  # pragma: no cover - ray not importable
        ctxs = []
    for ds in datasets:
        ctx = getattr(ds, "context", None)
        if ctx is not None:
            ctxs.append(ctx)
    # Dedupe by identity: two datasets derived from one source share a
    # context object; patching it twice would record prev=False for the
    # second entry and the restore would leave the flag stuck False.
    seen_ids = set()
    for ctx in ctxs:
        if id(ctx) in seen_ids:
            continue
        seen_ids.add(id(ctx))
        prev = getattr(ctx, "op_resource_reservation_enabled", None)
        if prev is not None:
            targets.append((ctx, prev))
            ctx.op_resource_reservation_enabled = False
    try:
        yield
    finally:
        # Reversed restore so, even if dedupe were ever bypassed, the
        # first-recorded (true ambient) previous value wins.
        for ctx, prev in reversed(targets):
            ctx.op_resource_reservation_enabled = prev
