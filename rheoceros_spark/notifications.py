"""Notification compute targets — EMAIL / Slack (SURVEY §2.10).

The reference ships side-effect compute targets that run as inlined
slots after (or alongside) data slots: ``EMAIL(sender, recipient_list)
.action(subject=..., body=...)`` backed by SES (reference
``platform/compute_targets/email.py``, ~240 LoC) and a Slack
workflow-webhook poster (reference ``platform/compute_targets/
slack.py``, ~280 LoC).

Engine mapping: a notification is an :class:`InlinedCompute` slot — it
never touches the row path, so it costs nothing at 100 TB.  Rendering
(``{dim}`` substitution into subject/body/message from the execution's
materialized output dimension values) is real and tested; *transport*
is pluggable.  The default transport appends one JSON line to a local
outbox file (deterministic, testable, no network); real SMTP/webhook
delivery is gated behind an import-try so environments with the libs
and credentials can pass ``deliver=`` explicitly.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Callable, Optional, Sequence

from rheoceros_spark.compute import InlinedCompute, _substitute_dims

DEFAULT_OUTBOX = os.path.join(tempfile.gettempdir(), "rheoceros_spark", "notifications.jsonl")


def _outbox_deliver(record: dict[str, Any], outbox: str) -> None:
    os.makedirs(os.path.dirname(outbox), exist_ok=True)
    with open(outbox, "a", encoding="utf-8") as f:
        f.write(json.dumps(record, sort_keys=True, default=str) + "\n")


class _NotificationAction(InlinedCompute):
    """The slot produced by ``.action(...)``: renders the payload with
    the execution's output dimension values, then hands it to the
    transport."""

    def __init__(
        self,
        kind: str,
        header: dict[str, Any],
        payload: dict[str, str],
        deliver: Optional[Callable[[dict[str, Any]], None]] = None,
        outbox: str = DEFAULT_OUTBOX,
    ):
        self.kind = kind
        self.header = header
        self.payload = payload
        self.deliver = deliver
        self.outbox = outbox
        super().__init__(self._send)

    def _send(self, input_map: dict[str, Any], output: Any, params: dict[str, Any]) -> dict[str, Any]:
        dims = {k: v for k, v in params.items()}
        record = {
            "kind": self.kind,
            **self.header,
            **{k: _substitute_dims(v, dims) for k, v in self.payload.items()},
            "dimensions": dims,
            "output": getattr(output, "alias", None),
        }
        if self.deliver is not None:
            self.deliver(record)
        else:
            _outbox_deliver(record, self.outbox)
        return record


class EMAIL:
    """``EMAIL(sender=..., recipient_list=[...]).action(subject=...,
    body=...)`` (reference ``platform/compute_targets/email.py``).
    ``{dim}`` tokens in subject/body render with output dim values."""

    def __init__(self, sender: str, recipient_list: Sequence[str], **conf: Any):
        self.sender = sender
        self.recipient_list = list(recipient_list)
        self.conf = conf

    def action(
        self,
        subject: str = "",
        body: str = "",
        deliver: Optional[Callable[[dict[str, Any]], None]] = None,
        outbox: str = DEFAULT_OUTBOX,
    ) -> _NotificationAction:
        return _NotificationAction(
            "email",
            {"sender": self.sender, "recipient_list": self.recipient_list, **self.conf},
            {"subject": subject, "body": body},
            deliver=deliver,
            outbox=outbox,
        )


class Slack:
    """``Slack(recipient_list=[workflow-webhook-urls], message=...)
    .action()`` (reference ``platform/compute_targets/slack.py``)."""

    def __init__(self, recipient_list: Sequence[str], message: str = "", **conf: Any):
        self.recipient_list = list(recipient_list)
        self.message = message
        self.conf = conf

    def action(
        self,
        message: Optional[str] = None,
        deliver: Optional[Callable[[dict[str, Any]], None]] = None,
        outbox: str = DEFAULT_OUTBOX,
    ) -> _NotificationAction:
        return _NotificationAction(
            "slack",
            {"recipient_list": self.recipient_list, **self.conf},
            {"message": message if message is not None else self.message},
            deliver=deliver,
            outbox=outbox,
        )
