"""AMQP/RabbitMQ report submitter + consumer — the last §2 transport wire.

Reimplements the SEMANTICS of fever's AMQP plumbing against an injectable
connection factory (the wabbit interface trick the reference itself uses
so its tests run on a fake server):

* ``AMQPSubmitter`` — /root/reference/util/submitter_amqp.go:165-233:
  gzip-optional payloads, ``sensor_id``/``compressed`` headers plus
  caller extras, publish to (exchange=target, routing_key=key), publish
  errors logged-and-dropped;
  submitter_amqp.go:59-86: failed connections retried on a fixed delay
  until re-established;
  submitter_amqp.go:47-49,114-156: one shared, reference-counted
  connection per broker URL (``Finish`` closes at zero).
* ``AMQPConsumer`` — /root/reference/util/consumer.go: declare exchange,
  declare+bind queue, deliver each message to a callback.

The default connector speaks real AMQP via ``pika`` (optional import —
absent in this container, so it is resolved lazily and tests inject a
fake broker).  Payload framing matches the reference: body is the (maybe
gzipped) raw bytes; ``content_type``/``content_encoding``/headers carry
the metadata a fever consumer expects, so a repo submitter can feed an
existing fever exchange and vice versa.
"""

from __future__ import annotations

import gzip
import io
import socket
import threading
import time
from typing import Callable

__all__ = [
    "AMQPSubmitter",
    "AMQPConsumer",
    "PikaConnector",
    "decode_payload",
    "get_sensor_id",
]


def get_sensor_id() -> str:
    """util.GetSensorID falls back to the hostname when no sensor-id file
    is configured; the hostname IS the id for a batch engine."""
    return socket.gethostname()


# --------------------------------------------------------------------------
# default (real) connector — optional pika import, adapted to the minimal
# channel surface the submitter/consumer use
# --------------------------------------------------------------------------


class _PikaChannel:
    def __init__(self, ch):
        self._ch = ch

    def exchange_declare(self, exchange: str, exchange_type: str = "direct",
                         durable: bool = True) -> None:
        self._ch.exchange_declare(
            exchange=exchange, exchange_type=exchange_type, durable=durable
        )

    def queue_declare(self, queue: str, durable: bool = True) -> str:
        res = self._ch.queue_declare(queue=queue, durable=durable)
        return res.method.queue

    def queue_bind(self, queue: str, exchange: str, routing_key: str) -> None:
        self._ch.queue_bind(queue=queue, exchange=exchange,
                            routing_key=routing_key)

    def publish(self, exchange: str, routing_key: str, body: bytes,
                props: dict) -> None:
        import pika

        self._ch.basic_publish(
            exchange=exchange,
            routing_key=routing_key,
            body=body,
            properties=pika.BasicProperties(
                content_type=props.get("content_type"),
                content_encoding=props.get("content_encoding") or None,
                headers=props.get("headers") or {},
            ),
        )

    def consume(self, queue: str, callback, limit: int | None = None,
                inactivity_timeout: float = 1.0) -> int:
        n = 0
        for method, properties, body in self._ch.consume(
            queue, inactivity_timeout=inactivity_timeout
        ):
            if method is None:  # inactivity tick — queue drained
                break
            callback(
                body,
                {
                    "content_type": properties.content_type,
                    "content_encoding": properties.content_encoding,
                    "headers": dict(properties.headers or {}),
                },
            )
            self._ch.basic_ack(method.delivery_tag)
            n += 1
            if limit is not None and n >= limit:
                break
        self._ch.cancel()
        return n

    def close(self) -> None:
        try:
            self._ch.close()
        except Exception:
            pass


class _PikaConnection:
    def __init__(self, conn):
        self._conn = conn

    def channel(self) -> _PikaChannel:
        return _PikaChannel(self._conn.channel())

    def close(self) -> None:
        try:
            self._conn.close()
        except Exception:
            pass


class PikaConnector:
    """``connector(url) -> Connection`` over pika.BlockingConnection.
    Import deferred to call time: the container has no pika, tests inject
    fakes, and a user with a broker gets the real client."""

    def __call__(self, url: str) -> _PikaConnection:
        try:
            import pika
        except ImportError as exc:  # pragma: no cover - env dependent
            raise RuntimeError(
                "AMQP transport requires the optional 'pika' package "
                "(pip install pika), or pass connector=..."
            ) from exc
        return _PikaConnection(
            pika.BlockingConnection(pika.URLParameters(url))
        )


# --------------------------------------------------------------------------
# shared, reference-counted per-URL connections (submitter_amqp.go:47-49)
# --------------------------------------------------------------------------


class _BaseSubmitter:
    def __init__(self, url: str, connector: Callable, reconnect_delay: float,
                 sleep: Callable[[float], None],
                 max_reconnect_attempts: int | None):
        self.url = url
        self.connector = connector
        self.reconnect_delay = reconnect_delay
        self.sleep = sleep
        self.max_reconnect_attempts = max_reconnect_attempts
        self.sensor_id = get_sensor_id()
        self.lock = threading.Lock()
        self.refs = 0
        self.conn = None
        self.chan = None
        self.stats = {"published": 0, "dropped": 0, "reconnects": 0,
                      "bytes_raw": 0, "bytes_payload": 0}

    # caller holds self.lock
    def _connect_locked(self) -> None:
        self.conn = self.connector(self.url)
        self.chan = self.conn.channel()

    def _reconnect_locked(self) -> bool:
        """Fixed-delay retry loop (submitter_amqp.go:60-86 reconnects every
        amqpReconnDelay=5s until the broker answers).  Bounded only when
        the caller asked for a bound; returns False when the bound is hit."""
        attempts = 0
        while True:
            try:
                self._connect_locked()
                self.stats["reconnects"] += 1
                return True
            except Exception:
                self.conn = self.chan = None
                attempts += 1
                if (self.max_reconnect_attempts is not None
                        and attempts >= self.max_reconnect_attempts):
                    return False
                self.sleep(self.reconnect_delay)

    def close_locked(self) -> None:
        for obj in (self.chan, self.conn):
            if obj is not None:
                try:
                    obj.close()
                except Exception:
                    pass
        self.conn = self.chan = None


_SUBMITTERS: dict[str, _BaseSubmitter] = {}
_REGISTRY_LOCK = threading.Lock()


class AMQPSubmitter:
    """Publish reports to a RabbitMQ exchange, fever-style.

    ``submit(raw, key, content_type)`` / ``submit_with_headers(...)``:
    gzip when compression is on, attach ``sensor_id`` + ``compressed``
    headers, publish to (exchange=``target``, routing_key=``key``).  A
    broken connection is re-dialed on a fixed delay and the publish
    retried once; a message whose retry also fails is logged-and-dropped
    (the reference's behavior — submission is telemetry, it must never
    wedge the pipeline).  Connections are shared per URL and reference
    counted; ``finish()`` releases (closing at zero)."""

    def __init__(self, url: str, target: str, *, compress: bool = False,
                 connector: Callable | None = None,
                 reconnect_delay: float = 5.0,
                 sleep: Callable[[float], None] = time.sleep,
                 max_reconnect_attempts: int | None = None,
                 verbose: bool = False):
        self.target = target
        self.compress = compress
        self.verbose = verbose
        with _REGISTRY_LOCK:
            base = _SUBMITTERS.get(url)
            if base is None:
                base = _BaseSubmitter(
                    url, connector or PikaConnector(), reconnect_delay,
                    sleep, max_reconnect_attempts,
                )
                _SUBMITTERS[url] = base
            base.refs += 1
        self._base = base

    # -- API parity --------------------------------------------------------
    def use_compression(self) -> None:
        self.compress = True

    @property
    def stats(self) -> dict:
        return dict(self._base.stats)

    def submit(self, raw: bytes, key: str,
               content_type: str = "application/json") -> bool:
        return self.submit_with_headers(raw, key, content_type, None)

    def submit_with_headers(self, raw: bytes, key: str,
                            content_type: str = "application/json",
                            headers: dict | None = None) -> bool:
        if isinstance(raw, str):
            raw = raw.encode()
        if self.compress:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb") as gz:
                gz.write(raw)
            payload, encoding, is_compressed = buf.getvalue(), "gzip", "true"
        else:
            payload, encoding, is_compressed = raw, "", "false"
        props = {
            "content_type": content_type,
            "content_encoding": encoding,
            "headers": {
                "sensor_id": self._base.sensor_id,
                "compressed": is_compressed,
                **(headers or {}),
            },
        }
        base = self._base
        with base.lock:
            if base.chan is None and not base._reconnect_locked():
                base.stats["dropped"] += 1
                return False
            for attempt in (0, 1):
                try:
                    base.chan.publish(self.target, key, payload, props)
                    base.stats["published"] += 1
                    base.stats["bytes_raw"] += len(raw)
                    base.stats["bytes_payload"] += len(payload)
                    return True
                except Exception:
                    base.close_locked()
                    if attempt == 0 and base._reconnect_locked():
                        continue  # one retry on the fresh connection
                    base.stats["dropped"] += 1
                    return False
        return False  # pragma: no cover - unreachable

    def finish(self) -> None:
        base = self._base
        with _REGISTRY_LOCK:
            base.refs -= 1
            if base.refs <= 0:
                with base.lock:
                    base.close_locked()
                _SUBMITTERS.pop(base.url, None)


# --------------------------------------------------------------------------
# consumer (util/consumer.go)
# --------------------------------------------------------------------------


def decode_payload(body: bytes, props: dict) -> bytes:
    """Undo the submitter's optional gzip framing, trusting the header the
    way a fever consumer does (``compressed`` header or content_encoding)."""
    hdr = props.get("headers") or {}
    if (props.get("content_encoding") == "gzip"
            or hdr.get("compressed") == "true"):
        return gzip.decompress(body)
    return body


class AMQPConsumer:
    """Declare exchange + durable queue, bind, and deliver messages to a
    callback(body, props) — consumer.go's NewConsumer + handleLoop with a
    pull-style ``drain`` (bounded, testable) instead of a goroutine."""

    def __init__(self, url: str, exchange: str, exchange_type: str,
                 queue: str, key: str,
                 callback: Callable[[bytes, dict], None],
                 *, connector: Callable | None = None):
        self.callback = callback
        self.conn = (connector or PikaConnector())(url)
        self.chan = self.conn.channel()
        self.chan.exchange_declare(exchange, exchange_type, durable=True)
        self.queue = self.chan.queue_declare(queue, durable=True)
        self.chan.queue_bind(self.queue, exchange, key)

    def drain(self, limit: int | None = None) -> int:
        """Deliver up to ``limit`` pending messages (all when None);
        returns the count delivered."""
        return self.chan.consume(self.queue, self.callback, limit=limit)

    def close(self) -> None:
        self.chan.close()
        self.conn.close()


# --------------------------------------------------------------------------
# metrics/lineage emission seam → exchange
# --------------------------------------------------------------------------


def submit_metrics(submitter: AMQPSubmitter, metrics_dir: str,
                   key: str = "fever.stats") -> int:
    """Ship every per-stage metrics record (core.metrics JSONL seam) to the
    exchange as JSON lines — the PerformanceStatsEncoder→AMQP path
    (performance_stats_encoder.go feeds submitter_amqp.go in the
    reference).  Returns the number of records submitted."""
    import json
    import os

    n = 0
    if os.path.isdir(metrics_dir):
        for f in sorted(os.listdir(metrics_dir)):
            if f.startswith("metrics-") and f.endswith(".jsonl"):
                with open(os.path.join(metrics_dir, f)) as fh:
                    for line in fh:
                        if line.strip() and submitter.submit(
                            line.strip().encode(), key
                        ):
                            n += 1
    return n
