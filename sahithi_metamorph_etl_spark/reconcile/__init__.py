from .diff import DiffResult, diff
from .report import deliver_recon_report, render_report_html, smtp_transport

__all__ = [
    "DiffResult",
    "diff",
    "deliver_recon_report",
    "render_report_html",
    "smtp_transport",
]
