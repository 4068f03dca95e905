"""In-process routing runtime — the event-driven core (SURVEY §2.9).

Re-expresses the reference's routing layer (reference
``src/intelliflow/core/signal_processing/routing_runtime_constructs.py``
+ ``core/platform/constructs.py:3293-3600``) without the AWS control
plane: state lives in this process, events are injected via
``Application.process()``.

Semantics preserved:

* **Trigger condition** — a route fires when every non-reference input
  has received an event and all linked dimensions are *tips-aligned*
  (reference ``RuntimeLinkNode.is_ready``,
  ``routing_runtime_constructs.py:299-314,474-500``).
* **Pending-node state & dedup** — one :class:`RuntimeLinkNode` per
  distinct linked-dimension tuple; repeated events on an already
  consumed path are idempotent (``:616-675``).
* **References** never seed pending nodes (``:1410-1425``); their
  partitions are derived from the triggering side (J4).
* **Range check** — inputs with ``range_check_required`` block the
  trigger until every partition in the range exists; ``nearest``
  blocks until at least one exists (``:316-368``; J5).
* **Zombie detection** — on node creation, prove via the link matrix
  whether the remaining inputs can ever match; else drop (``:547-614``).
* **TTL** — pending nodes expire after
  ``pending_node_expiration_ttl_in_secs`` with an expiration hook
  (``Route.check_expired_nodes``, ``:1446-1459``).

Spark mapping note: this is deliberately a **driver-side scheduler**
(partition-grain state, a few entries), not per-row Spark state — the
reference's pending nodes are partition-level too.  Row-level
streaming belongs to the compute slots (Structured Streaming), not
here.
"""

from __future__ import annotations

import time
from typing import Any, Optional

from rheoceros_spark.dimensions import DimensionFilter
from rheoceros_spark.signals import EQUALS, Signal, expand_literal_lists
from rheoceros_spark.sources.io import partition_ready


class RuntimeLinkNode:
    """Per-trigger-group join state (reference :228-244)."""

    def __init__(self, route: "Route", created_at: Optional[float] = None):
        self.route = route
        self.ready: dict[str, dict[str, Any]] = {}  # alias -> material dim values
        #: (alias, path) pairs — keyed per ALIAS so one physical event
        #: can be consumed by several aliases of the same upstream
        #: (dict-inputs self-join) while re-sends stay idempotent
        self.processed_paths: set[tuple[str, str]] = set()
        self.created_at = created_at if created_at is not None else time.time()
        self.is_zombie = False
        # blocked = trigger may complete but execution is deferred until a
        # non-blocked event (backfill-in-flight, reference
        # routing_runtime_constructs.py:616-675 / application.py:2993)
        self.blocked = False

    def _expected_values(self, alias: str) -> Optional[dict[str, Any]]:
        """Values this node expects for ``alias``, derived from already
        ready signals via the link matrix (tips-aligned check uses the
        head value only, reference :490-498)."""
        if not self.ready:
            return None
        known = self.route.node.link_node.propagate(dict(self.ready))
        return known.get(alias)

    def offer(self, alias: str, values: dict[str, Any], path: str) -> bool:
        """True if the event belongs to this node (consumed or deduped)."""
        if (alias, path) in self.processed_paths:
            return True  # idempotent re-consume (reference :626-629)
        expected = self._expected_values(alias)
        if expected:
            for dim, val in expected.items():
                if dim in values and str(values[dim]) != str(val):
                    return False  # belongs to a different trigger group
        elif alias in self.ready:
            if any(str(self.ready[alias].get(d)) != str(v) for d, v in values.items()):
                return False
        self.ready[alias] = dict(values)
        self.processed_paths.add((alias, path))
        return True

    def check_zombie(self) -> bool:
        """Can the not-yet-ready inputs ever match?  Derive their linked
        values and chain against the declared filters (reference
        :547-614)."""
        known = self.route.node.link_node.propagate(dict(self.ready))
        for sig in self.route.node.link_node.independent_signals:
            if sig.alias in self.ready:
                continue
            derived = known.get(sig.alias)
            if not derived:
                continue
            values = [derived.get(d.name, "*") for d in sig.spec]
            try:
                m = sig.filter.apply_values(values)
            except ValueError:
                self.is_zombie = True
                return True
            if len(m) == 0:
                self.is_zombie = True
                return True
        return False

    def is_ready(
        self, spark, check_ranges: bool = True, completed_cache: Optional[set] = None
    ) -> bool:
        """Range check with the reference's two IO optimizations
        (``_check_ranges`` + ``transfer_ranges``,
        routing_runtime_constructs.py:316-341, 370-395):

        * ``completed_cache`` is the routing table's **global** view of
          already-verified-complete paths, shared across pending nodes,
          inputs and routes — a partition that passed the completion
          protocol once is immutable, so re-offered events never re-probe
          it (driver-side FS probes were O(events × range-width) before).
        * fail-fast: stop probing a range at the first missing partition
          (``needs_all``) / first hit (``needs_one``).
        """
        indep = self.route.node.link_node.independent_signals
        if any(s.alias not in self.ready for s in indep):
            return False
        if not check_ranges:
            return True
        known = self.route.node.link_node.propagate(dict(self.ready))
        for sig in self.route.node.link_node.signals:
            needs_all = sig.range_check_required
            needs_one = sig.nearest_in_range
            if not (needs_all or needs_one):
                continue
            if sig.source is None:
                continue  # sourceless (timer-like) inputs have no partitions to probe
            derived = known.get(sig.alias, self.ready.get(sig.alias, {}))
            values = [derived.get(d.name, "*") for d in sig.spec]
            try:
                m = sig.materialize(values)
                # a dimension not derivable from the link matrix leaves a
                # wildcard → non-material filter; the range can't be
                # verified yet, so the trigger BLOCKS (not a crash)
                paths = sig.source.materialize_paths(m.filter)
            except ValueError:
                return False
            sig_ok = True
            any_ok = False
            for p in paths:
                if completed_cache is not None and p in completed_cache:
                    ready = True
                else:
                    ready = partition_ready(spark, sig.source, p)
                    if ready and completed_cache is not None:
                        completed_cache.add(p)
                any_ok = any_ok or ready
                if needs_all and not ready:
                    sig_ok = False
                    break  # fail-fast: rest of the range can't fix this
                if needs_one and not needs_all and ready:
                    # nearest: one hit is enough — but when BOTH flags
                    # are set the whole range must still be verified, so
                    # the early exit only applies to pure nearest mode
                    break
            if needs_one and not any_ok:
                sig_ok = False  # nearest: nothing in range exists
            if not sig_ok:
                return False
        return True


class Route:
    """Activated node + pending-node state (reference :1172-1227)."""

    def __init__(self, node, pending_node_ttl_in_secs: Optional[float] = None):
        self.node = node  # InternalDataNode
        self.pending_nodes: list[RuntimeLinkNode] = []
        self.ttl = pending_node_ttl_in_secs
        #: runtime counters (reference get_route_metrics surfaces the
        #: same event/trigger/failure series from CW,
        #: application.py:429-531); in-process they are plain counts
        self.metrics: dict[str, int] = {
            "events": 0, "triggers": 0, "completions": 0, "failures": 0
        }

    def accepts(self, alias: str, resource_id: Optional[str] = None) -> Optional[Signal]:
        sigs = self.accepts_all(alias, resource_id)
        return sigs[0] if sigs else None

    def accepts_all(self, alias: str, resource_id: Optional[str] = None) -> list[Signal]:
        """ALL input signals the event binds to — a node may consume the
        same upstream under several aliases (dict-inputs self-join,
        e.g. ``{"today": a, "prev": a[:-7]}``); every one must see the
        event or the trigger group never completes."""
        return [
            sig
            for sig in self.node.link_node.signals
            if sig.alias == alias or (resource_id is not None and sig.resource_id == resource_id)
        ]

    def receive(
        self, spark, alias: str, tip: tuple, path: str,
        resource_id: Optional[str] = None,
        is_blocked: bool = False,
        completed_cache: Optional[set] = None,
    ) -> list[RuntimeLinkNode]:
        """Offer the event; return nodes that became ready (reference
        Route.receive, :1396-1444).  ``tip`` is positional — each route
        zips it with its own declared dimension names/aliases."""
        accepted: list[tuple[Signal, dict]] = []
        for sig in self.accepts_all(alias, resource_id):
            values = dict(zip(sig.dimension_names(), tip))
            # declared-filter compatibility gate (value mismatch → ignore)
            try:
                m = sig.materialize([values.get(d.name, "*") for d in sig.spec])
                if len(m.filter) == 0:
                    continue
            except ValueError:
                continue
            accepted.append((sig, values))
        if not accepted:
            return []

        consumed = None
        for node in self.pending_nodes:
            if any(node.offer(sig.alias, values, path) for sig, values in accepted):
                # deliver to every other bound alias of the same node too
                for sig, values in accepted:
                    node.offer(sig.alias, values, path)
                consumed = node
                break
        if consumed is None:
            seedable = [
                (s, v) for s, v in accepted if not (s.is_reference or s.nearest_in_range)
            ]
            if not seedable:
                # references/nearest never seed pending nodes (reference :1410-1425, :397-407)
                return []
            node = RuntimeLinkNode(self)
            for sig, values in accepted:
                node.offer(sig.alias, values, path)
            if node.check_zombie():
                return []
            self.pending_nodes.append(node)
            consumed = node
            # RoutePendingNodeHook.on_pending_node_created (reference
            # constructs.py:2500-2600; fires when a trigger group seeds)
            hook = self.node.hooks.get("on_pending_node_created")
            if hook:
                hook(self.node, node)
        # blocked events defer the node; a later non-blocked event unblocks
        consumed.blocked = is_blocked

        ready = [
            n
            for n in self.pending_nodes
            if not n.blocked and n.is_ready(spark, completed_cache=completed_cache)
        ]
        for n in ready:
            self.pending_nodes.remove(n)
        return ready

    def check_expired_nodes(self) -> list[RuntimeLinkNode]:
        """TTL GC (reference :1446-1459); fires the route's
        ``on_pending_node_expiration`` hook if declared."""
        if self.ttl is None:
            return []
        now = time.time()
        expired = [n for n in self.pending_nodes if now - n.created_at > self.ttl]
        for n in expired:
            self.pending_nodes.remove(n)
            hook = self.node.hooks.get("on_pending_node_expiration")
            if hook:
                hook(n)
        return expired


class RoutingTable:
    """All routes of an application (reference constructs.py:3293-3433)."""

    def __init__(self, app):
        self.app = app
        self.routes: dict[str, Route] = {
            node_id: Route(node, node.hooks.get("pending_node_ttl_in_secs"))
            for node_id, node in app._nodes.items()
        }
        #: global completed-path view shared by every route / pending node
        #: (reference common_completed_paths + transfer_ranges,
        #: routing_runtime_constructs.py:316-341, 370-395).  Completed
        #: partitions are immutable by the completion protocol, so entries
        #: only invalidate when the engine itself deletes a partition
        #: (Application.apply_retention purges swept paths); memory is
        #: one path string per verified partition.
        self.completed_paths: set[str] = set()

    def receive(
        self,
        signal: Signal,
        recursive_downstream: bool = True,
        is_blocked: bool = False,
        proves_completion: bool = True,
    ) -> list[str]:
        """Inject one materialized event; run every route that becomes
        ready; completed outputs feed downstream routes (the dataflow
        recursion, reference constructs.py:3435-3600)."""
        finalized = signal.filter.finalize()
        if not finalized.is_material:
            raise ValueError(f"process() requires material values; got {signal.filter!r}")
        tip = tuple(finalized.tip() or ())
        path = (
            signal.source.materialize_paths(finalized)[0]
            if signal.source is not None
            else f"{signal.resource_id}:{tip}"
        )
        if signal.source is not None and not is_blocked and proves_completion:
            # a COMPLETION event IS the completion notification
            # (reference advanced_input_modes "range_check succeeds via
            # event ingestion": a completion-file event proves the
            # partition complete even when a storage probe cannot see
            # it yet — S3 list eventual consistency).  Callers pass
            # ``proves_completion=False`` for events that only prove
            # data is ARRIVING (a part-file object-created event on a
            # dataset with a declared completion protocol — marking
            # those complete would let every range check read
            # half-written partitions); blocked events mark backfills
            # in flight and prove nothing either way.
            self.completed_paths.add(path)

        outputs: list[str] = []
        for route in self.routes.values():
            if route.accepts(signal.alias, signal.resource_id) is not None:
                route.metrics["events"] += 1
            ready_nodes = route.receive(
                self.app.spark, signal.alias, tip, path,
                resource_id=signal.resource_id, is_blocked=is_blocked,
                completed_cache=self.completed_paths,
            )
            for i, ready_node in enumerate(ready_nodes):
                derived = self._materialize_output(route, ready_node)
                if derived is None:
                    continue
                route.metrics["triggers"] += 1
                # projection fan-out: list literals → one execution per value
                # (exec lifecycle hooks — on_exec_begin/on_compute_success/
                # checkpoints/on_success — fire inside _run_node, shared
                # with the execute() path)
                for out_values in expand_literal_lists(derived):
                    try:
                        out_path = self.app._run_node(route.node, out_values, recursive=False)
                    except Exception:
                        route.metrics["failures"] += 1
                        # a failed trigger must not destroy join state:
                        # requeue this node (an event re-send re-offers
                        # idempotently and re-triggers) and every ready
                        # node this loop hasn't reached yet
                        route.pending_nodes.extend(ready_nodes[i:])
                        raise
                    route.metrics["completions"] += 1
                    outputs.append(out_path)
                    if recursive_downstream:
                        # the output's own signal feeds downstream routes
                        out_sig = route.node.output_signal.clone()
                        out_sig.filter = DimensionFilter.load_raw(
                            out_sig.spec,
                            [out_values[d] for d in out_sig.dimension_names()],
                        )
                        outputs.extend(self.receive(out_sig))
        return outputs

    def _materialize_output(self, route: Route, node: RuntimeLinkNode) -> Optional[dict[str, Any]]:
        """Map ready-input dim values through the output link matrix (J9,
        reference :677-722); literal assignments win."""
        known = route.node.link_node.propagate(dict(node.ready))
        out_values: dict[str, Any] = {}
        for link in route.node.output_links:
            if getattr(link, "reverse", False):
                # input ← f(output) declarations serve back-derivation
                # only; applying them forward would run the INVERSE map
                continue
            if link.literal is not None:
                out_values[link.output_dim] = link.literal
            elif all(r[0] in known and r[1] in known[r[0]] for r in link.rhs):
                out_values[link.output_dim] = (link.func or EQUALS)(
                    *[known[r[0]][r[1]] for r in link.rhs]
                )
        if set(out_values) != set(route.node.output_signal.dimension_names()):
            return None
        return out_values

    def check_expired(self) -> int:
        return sum(len(r.check_expired_nodes()) for r in self.routes.values())
