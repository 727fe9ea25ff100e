"""Report delivery (SURVEY.md §2.11 Q6, ref Raptor.py:142-263): the
five-section HTML render over a real DiffResult, the subject contract,
and the stdlib smtplib transport against a socket-level fake SMTP
server (the full 220/EHLO/MAIL/RCPT/DATA/QUIT dialogue — no network)."""

from __future__ import annotations

import re
import socket
import threading

from sahithi_metamorph_etl_spark.reconcile import diff
from sahithi_metamorph_etl_spark.reconcile.report import (
    SECTION_TITLES,
    build_html_email,
    deliver_recon_report,
    render_report_html,
    smtp_transport,
)


def _diff_fixture(spark):
    src = spark.createDataFrame(
        [
            (1, "alice", 10.0),
            (2, "bob", 20.0),
            (3, "carol", 30.0),
            (4, "dan", 40.0),
            (5, "eve <script>", 50.0),  # source-extra; markup must be escaped
            (6, "frank", 60.0),  # source-extra
        ],
        "id bigint, name string, amount double",
    )
    tgt = spark.createDataFrame(
        [
            (1, "alice", 10.0),
            (2, "BOB", 20.0),  # name mismatch
            (3, "carol", 31.0),  # amount mismatch
            (4, "dan", 44.0),  # amount mismatch
            (7, "grace", 70.0),  # target-extra
        ],
        "id bigint, name string, amount double",
    )
    return diff(src, tgt, keys=["id"])


def test_report_html_sections_samples_and_escaping(spark):
    d = _diff_fixture(spark)
    html = render_report_html(d, keys=["id"])

    for title in SECTION_TITLES:
        assert title in html
    # per-column sample: exactly ONE row per mismatched column
    # (amount has two mismatched cells, name one -> 2 sample rows)
    assert html.count("<td>amount</td>") >= 1
    sample_section = html.split(SECTION_TITLES[1])[1].split(SECTION_TITLES[2])[0]
    assert sample_section.count("<td>amount</td>") == 1
    assert sample_section.count("<td>name</td>") == 1
    # the amount sample is the (source_value DESC) winner: 40.0 vs 44.0
    assert "<td>40.0</td>" in sample_section and "<td>44.0</td>" in sample_section
    # percentage section ordered worst-first: amount (2/4) before name (1/4)
    pct_section = html.split(SECTION_TITLES[2])[1].split(SECTION_TITLES[3])[0]
    assert pct_section.index("<td>amount</td>") < pct_section.index("<td>name</td>")
    # extras present and markup escaped everywhere
    assert "<td>eve &lt;script&gt;</td>" in html and "<td>grace</td>" in html
    assert "<script>" not in html and "&lt;script&gt;" in html


def test_extra_row_samples_are_bounded(spark):
    src = spark.createDataFrame(
        [(i, f"n{i}") for i in range(40)], "id bigint, name string"
    )
    tgt = spark.createDataFrame([(0, "n0")], "id bigint, name string")
    d = diff(src, tgt, keys=["id"])
    html = render_report_html(d, keys=["id"], extra_sample_rows=5)
    extra_section = html.split(SECTION_TITLES[3])[1].split(SECTION_TITLES[4])[0]
    # 5 sample rows + 1 header row, deterministic lowest ids
    assert extra_section.count("<tr>") == 6
    for i in range(1, 6):
        assert f"<td>n{i}</td>" in extra_section
    assert "<td>n39</td>" not in extra_section


class _FakeSmtpServer:
    """Minimal RFC-5321 dialogue on a local socket: enough for
    smtplib's connect/EHLO/MAIL/RCPT/DATA/QUIT path, recording the
    envelope and message body."""

    def __init__(self):
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.mail_from: str | None = None
        self.rcpt_to: list[str] = []
        self.data = ""
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        conn, _ = self.sock.accept()
        f = conn.makefile("rb")
        conn.sendall(b"220 fake ESMTP\r\n")
        while True:
            line = f.readline().decode("utf-8", "replace").rstrip("\r\n")
            if not line:
                break
            verb = line.split(" ", 1)[0].upper()
            if verb in ("EHLO", "HELO"):
                conn.sendall(b"250-fake\r\n250 HELP\r\n")
            elif verb == "MAIL":
                self.mail_from = line
                conn.sendall(b"250 OK\r\n")
            elif verb == "RCPT":
                self.rcpt_to.append(line)
                conn.sendall(b"250 OK\r\n")
            elif verb == "DATA":
                conn.sendall(b"354 go\r\n")
                chunks = []
                while True:
                    dl = f.readline().decode("utf-8", "replace")
                    if dl in (".\r\n", ".\n"):
                        break
                    chunks.append(dl)
                self.data = "".join(chunks)
                conn.sendall(b"250 accepted\r\n")
            elif verb == "QUIT":
                conn.sendall(b"221 bye\r\n")
                break
            else:
                conn.sendall(b"250 OK\r\n")
        conn.close()
        self.sock.close()


def test_smtp_transport_real_dialogue():
    server = _FakeSmtpServer()
    transport = smtp_transport("127.0.0.1", server.port)
    msg = build_html_email(
        "subject line", "<p>body</p>", "sender@example.com",
        ["a@example.com", "b@example.com"],
    )
    transport(msg, "sender@example.com", ["a@example.com", "b@example.com"])
    server.thread.join(timeout=10)
    assert "sender@example.com" in (server.mail_from or "")
    assert len(server.rcpt_to) == 2 and "a@example.com" in server.rcpt_to[0]
    assert "Subject: subject line" in server.data
    assert "<p>body</p>" in server.data


def test_deliver_subject_contract(spark):
    import dataclasses

    d = _diff_fixture(spark)
    sent = []

    def transport(msg, sender, recipients):
        sent.append((msg["Subject"], msg["To"], msg.get_payload()))

    body = deliver_recon_report(
        d, ["id"], "orders", "ops@example.com", ["team@example.com"], transport
    )
    assert sent[0][0] == "Reconciliation summary for orders"
    assert sent[0][1] == "team@example.com"
    assert SECTION_TITLES[0] in body and body == sent[0][2]

    # empty overall summary -> FAILED subject + failure body, the
    # reference's contract (Raptor.py:252-258)
    failed = dataclasses.replace(d, summary=d.summary.limit(0))
    body2 = deliver_recon_report(
        failed, ["id"], "orders", "ops@example.com", ["team@example.com"], transport
    )
    assert sent[1][0] == "Reconciliation FAILED for orders"
    assert "no summary" in body2 and SECTION_TITLES[0] not in body2


def test_report_never_collects_more_than_the_caps(spark):
    """Bounded-by-construction: every rendered table is a limit(n)
    collect — assert via the plans that feed _table_html by rendering a
    wide diff and counting total data rows in the HTML."""
    src = spark.createDataFrame(
        [(i, f"s{i}", float(i)) for i in range(200)],
        "id bigint, name string, amount double",
    )
    tgt = spark.createDataFrame(
        [(i, f"t{i}", float(i + 1)) for i in range(200)],
        "id bigint, name string, amount double",
    )
    d = diff(src, tgt, keys=["id"])
    html = render_report_html(d, keys=["id"], sample_rows=15, extra_sample_rows=5)
    # sections: 1 summary + <=15 + <=15 + 0 extras + 0 extras; header
    # rows excluded by counting only rows with a first <td>
    n_data_rows = len(re.findall(r"<tr><td>", html))
    assert n_data_rows <= 1 + 15 + 15
