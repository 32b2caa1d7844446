"""Cross-host serving: one logical engine spanning multiple host processes.

The reference replicates requests to every TP-rank scheduler process with a
gloo pickle-broadcast (reference: scratchpad/utils/utils.py:353-384
broadcast_pyobj, scheduler.py:453-468). The TPU-native design is
single-controller-per-host SPMD: every host runs the SAME jitted step over
one global ``jax.sharding.Mesh`` (XLA runs the cross-host collectives over
ICI/DCN), so the only thing that must be replicated is the *runner command
stream* — which method to call with which host-side (numpy) batch.

- Host 0 (leader) runs the real Scheduler/Engine/HTTP front. Its
  ModelRunner is wrapped in :class:`LeaderRunner`, which broadcasts
  ``(method, payload)`` over a length-prefixed-pickle TCP control plane
  before executing locally.
- Followers run :func:`follower_loop`: receive commands and replay them on
  their local ModelRunner. Because inputs are bit-identical and sampling
  RNG is seeded identically, every host drives the identical XLA program;
  device-resident handles (the pending decode window and its chained last
  samples) are never shipped — each host uses its own.

Scope: the generate path (extend / decode windows / window pipelining),
embeddings, scoring, weight update, KV resize, capture, speculative
decoding (ngram drafts are host-computed; draft-model windows relay as
"draft:<method>" to a mirrored second runner; the EAGLE head relays as
"eagle:<method>"), runtime topping registration (followers rebuild the
same adapter pools from the broadcast state), multimodal (vision encode
is a replicated call), and the host KV tier (gather_pages replays as a
replicated-output collective so every host sees full pages; promoted
pages ride the scatter_pages broadcast). Param offload stays single-node.
"""

from __future__ import annotations

import pickle
import socket
import struct
import threading
from typing import Any, Optional

from scratchpad_tpu.utils import get_logger

logger = get_logger("multihost")

_LEN = struct.Struct("!Q")


def _send_msg(sock: socket.socket, obj: Any) -> None:
    data = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    sock.sendall(_LEN.pack(len(data)) + data)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("control-plane peer closed")
        buf.extend(chunk)
    return bytes(buf)


def _recv_msg(sock: socket.socket) -> Any:
    (n,) = _LEN.unpack(_recv_exact(sock, _LEN.size))
    return pickle.loads(_recv_exact(sock, n))


class ControlPlane:
    """Leader: accept follower connections and broadcast commands.
    Follower: connect and receive. (ZMQ-free: stdlib sockets only.)"""

    def __init__(self, addr: str, num_followers: int, is_leader: bool):
        host, port_s = addr.rsplit(":", 1)
        port = int(port_s)
        self.is_leader = is_leader
        if is_leader:
            self._srv = socket.create_server(
                (host, port), reuse_port=False, backlog=num_followers + 1
            )
            self._peers: list[socket.socket] = []
            self._lock = threading.Lock()
            for _ in range(num_followers):
                conn, peer = self._srv.accept()
                conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                self._peers.append(conn)
                logger.info("follower connected from %s", peer)
        else:
            last = None
            for _ in range(600):
                try:
                    self._sock = socket.create_connection((host, port), timeout=5)
                    break
                except OSError as e:
                    last = e
                    import time

                    time.sleep(0.5)
            else:
                raise ConnectionError(f"cannot reach leader at {addr}: {last}")
            self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)

    def broadcast(self, obj: Any) -> None:
        assert self.is_leader
        with self._lock:
            for p in self._peers:
                _send_msg(p, obj)

    def recv(self) -> Any:
        assert not self.is_leader
        return _recv_msg(self._sock)

    def close(self) -> None:
        if self.is_leader:
            for p in self._peers:
                try:
                    _send_msg(p, ("stop", None))
                    p.close()
                except OSError:
                    pass
            self._srv.close()
        else:
            self._sock.close()


# Runner methods whose (numpy-only) arguments are broadcast verbatim.
_PLAIN_METHODS = (
    "run_extend",
    "run_extend_with_hidden",
    "run_decode_window",
    "decode_multi",  # draft-runner speculation windows
    "run_embed",
    "run_score",
    "run_kv_only",
    "run_spec_verify",
    "run_spec_verify_h",
    "run_spec_verify_sampled",  # consumes _rng in lockstep on every host
    "encode_images",
    "image_token_embedding",
    "gather_pages",  # host-KV-tier offload: collective all-gather of pages
    "scatter_pages",  # host-KV-tier promote: page data rides the broadcast
    "resize_kv_pool",
    "update_weights",
    "capture",
)


class LeaderRunner:
    """Wrap the leader's ModelRunner: broadcast each device-touching call,
    then run it locally. Host-only state (allocators, configs) passes
    through untouched via __getattr__.

    ``prefix`` namespaces a second runner's command stream (the draft-model
    runner relays as "draft:<method>"; followers dispatch by prefix)."""

    def __init__(self, inner, ctrl: ControlPlane, prefix: str = ""):
        self._inner = inner
        self._ctrl = ctrl
        self._prefix = prefix
        for name in _PLAIN_METHODS:
            setattr(self, name, self._make_plain(name))

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def _make_plain(self, name):
        inner_fn = getattr(self._inner, name)
        wire = self._prefix + name

        def call(*args, **kwargs):
            self._ctrl.broadcast((wire, (args, kwargs)))
            return inner_fn(*args, **kwargs)

        return call

    # chained-window handles are device-resident: broadcast only whether the
    # chain is active; every host substitutes its own last-samples array
    def dispatch_decode_window(self, wb, num_steps, prev_tokens=None):
        self._ctrl.broadcast(
            (
                self._prefix + "dispatch_decode_window",
                ((wb, num_steps), prev_tokens is not None),
            )
        )
        return self._inner.dispatch_decode_window(wb, num_steps, prev_tokens)

    def fetch_decode_window(self, pending):
        # followers fetch too: it frees their copy of the pending handle and
        # keeps per-host dispatch depth in lockstep
        self._ctrl.broadcast((self._prefix + "fetch_decode_window", None))
        return self._inner.fetch_decode_window(pending)

    def shutdown(self):
        self._ctrl.close()


class LeaderEagle:
    """Relay wrapper for the EAGLE head (executor/eagle.py): its two
    device-touching methods take numpy-only payloads, so they broadcast
    verbatim under an "eagle:" prefix."""

    def __init__(self, inner, ctrl: ControlPlane):
        self._inner = inner
        self._ctrl = ctrl

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def write_pairs(self, wb_like) -> None:
        self._ctrl.broadcast(("eagle:write_pairs", ((wb_like,), {})))
        self._inner.write_pairs(wb_like)

    def propose(self, *args, **kwargs):
        self._ctrl.broadcast(("eagle:propose", (args, kwargs)))
        return self._inner.propose(*args, **kwargs)


def follower_loop(
    runner,
    ctrl: ControlPlane,
    draft_runner=None,
    eagle=None,
) -> None:
    """Replay the leader's command stream on this host's ModelRunner.

    Pending decode-window handles form a FIFO: with window pipelining the
    leader interleaves [dispatch W(n+1) chained, fetch W(n)], so the
    follower must chain from the NEWEST handle's device-resident samples
    while fetching the OLDEST. "draft:"/"eagle:" commands replay on this
    host's draft runner / EAGLE head; "register_topping" builds the same
    adapter pools the leader just registered."""
    from collections import deque

    pending: deque = deque()
    toppings_manager = None
    while True:
        name, payload = ctrl.recv()
        if name == "stop":
            logger.info("follower: stop received")
            return
        target = runner
        if name.startswith("draft:"):
            if draft_runner is None:
                raise RuntimeError("follower: draft command without a draft runner")
            target, name = draft_runner, name[len("draft:"):]
        elif name.startswith("eagle:"):
            if eagle is None:
                raise RuntimeError("follower: eagle command without an EAGLE head")
            args, kwargs = payload
            getattr(eagle, name[len("eagle:"):])(*args, **kwargs)
            continue
        if name == "dispatch_decode_window":
            (wb, num_steps), chained = payload
            if chained and not pending:
                raise RuntimeError(
                    "follower: chained dispatch with no in-flight window "
                    "(command stream desync)"
                )
            prev = pending[-1][1] if chained else None
            pending.append(target.dispatch_decode_window(wb, num_steps, prev))
        elif name == "fetch_decode_window":
            if not pending:
                raise RuntimeError(
                    "follower: fetch with no in-flight window "
                    "(command stream desync)"
                )
            target.fetch_decode_window(pending.popleft())
        elif name == "register_topping":
            if toppings_manager is None:
                import jax.numpy as jnp

                from scratchpad_tpu.toppings import ToppingsManager

                toppings_manager = ToppingsManager(
                    runner.model_config, dtype=runner._dtype()
                )
            kw = payload
            if kw.get("delta_state") is not None:
                toppings_manager.register_delta(
                    kw["name"], kw["delta_state"], kw["scaling"]
                )
            else:
                toppings_manager.register_state(
                    kw["name"], kw["state"], kw["scaling"]
                )
            runner.attach_toppings(toppings_manager)
        else:
            args, kwargs = payload
            getattr(target, name)(*args, **kwargs)


def init_multihost(args):
    """jax.distributed bootstrap from ServerArgs (no-op on 1 node)."""
    if args.num_nodes <= 1:
        return
    import jax

    jax.distributed.initialize(
        coordinator_address=args.dist_init_addr,
        num_processes=args.num_nodes,
        process_id=args.node_rank,
    )
    logger.info(
        "jax.distributed up: process %d/%d, %d global devices",
        args.node_rank,
        args.num_nodes,
        len(jax.devices()),
    )
