"""9-way table classification + per-type metadata (KERNEL_SPEC.md §4.4).

Semantics of /root/reference/enterprise_table_extractor_full.py:86-282
(TableClassifier). The reference source is doubly mojibake-encoded in
places (quirk #3, ref :125-126, :198, :213, :230-231): its literals for
±, €, £, ¥, °, μ went through two utf-8→cp1252 mis-decodes. We generate
those byte-exact literals with :func:`_m2` instead of pasting them, and
they stay dead code on real text exactly as in the reference.

Determinism fixes (quirk #8): tickers keep first-occurrence order
(ref ``list(set(...))[:10]`` is hash-order); classification tie-break is
the fixed dict order (same as the reference's dict iteration).
"""

from __future__ import annotations

import re


def _m1(s: str) -> str:
    """One utf-8→cp1252 mojibake round."""
    return s.encode("utf-8").decode("cp1252")


def _m2(s: str) -> str:
    """Two rounds — the reference's double-mojibake literals."""
    return _m1(_m1(s))


_PM = _m2("±")  # 'Ã‚Â±'
_DEG = _m2("°")
_MU = _m2("μ")

CLASS_ORDER = [
    "financial_income",
    "financial_balance",
    "financial_cashflow",
    "financial_ratios",
    "scientific_data",
    "clinical_trial",
    "market_data",
    "esg_metrics",
    "portfolio_holdings",
]

CLASSIFICATIONS = {
    "financial_income": {
        "keywords": [
            "revenue", "income", "expense", "profit", "loss", "earnings",
            "ebitda", "margin", "sales", "cost", "operating", "net income",
            "gross profit",
        ],
        "patterns": [r"\$[\d,]+", r"million", r"billion", r"thousand",
                     r"mn", r"bn"],
        "extract": ["currency", "fiscal_period", "units",
                    "company_identifiers"],
    },
    "financial_balance": {
        "keywords": [
            "assets", "liabilities", "equity", "debt", "capital", "cash",
            "receivables", "payables", "inventory", "goodwill",
        ],
        "patterns": [r"\$[\d,]+", r"balance sheet",
                     r"statement of financial position"],
        "extract": ["currency", "date", "units", "accounting_standard"],
    },
    "financial_cashflow": {
        "keywords": [
            "cash flow", "operating", "investing", "financing",
            "free cash flow", "capex", "working capital", "dividends",
        ],
        "patterns": [r"cash", r"flow", r"fcf"],
        "extract": ["currency", "period", "units", "cash_flow_type"],
    },
    "financial_ratios": {
        "keywords": [
            "ratio", "margin", "roe", "roa", "roi", "eps", "p/e",
            "debt/equity", "current ratio", "quick ratio", "leverage",
        ],
        "patterns": [r"\d+\.\d+x", r"\d+%", r"times", r"percent"],
        "extract": ["ratio_types", "comparison_period", "benchmarks"],
    },
    "scientific_data": {
        "keywords": [
            "experiment", "sample", "control", "mean", "std", "p-value",
            "significant", "correlation", "n=", "error", "ci", "confidence",
        ],
        "patterns": [
            _PM,
            r"p\s*[<=]\s*0\.\d+",
            r"\d+\.\d+\s*" + _PM + r"\s*\d+\.\d+",
            r"r\s*=\s*[0-9.-]+",
            r"n\s*=\s*\d+",
        ],
        "extract": ["units", "statistical_measures", "sample_size",
                    "p_values"],
    },
    "clinical_trial": {
        "keywords": [
            "patient", "placebo", "treatment", "adverse", "efficacy",
            "safety", "endpoint", "phase", "randomized", "double-blind",
        ],
        "patterns": [r"phase\s+[IVX123]", r"n\s*=\s*\d+", r"%\s*\([^)]+\)"],
        "extract": ["trial_phase", "patient_count", "endpoints",
                    "drug_name"],
    },
    "market_data": {
        "keywords": [
            "price", "volume", "market cap", "shares", "trading", "close",
            "open", "high", "low", "bid", "ask", "yield",
        ],
        "patterns": [r"\$\d+\.\d{2}", r"\d+[KMB]", r"\d{1,3}(,\d{3})*"],
        "extract": ["ticker_symbols", "date_range", "exchange", "currency"],
    },
    "esg_metrics": {
        "keywords": [
            "carbon", "emissions", "scope", "renewable", "diversity",
            "governance", "sustainability", "ghg", "co2", "environmental",
        ],
        "patterns": [r"tco2e?", r"mwh", r"gj", r"scope\s*[123]"],
        "extract": ["metric_type", "reporting_standard", "time_period"],
    },
    "portfolio_holdings": {
        "keywords": [
            "holdings", "position", "weight", "allocation", "security",
            "cusip", "isin", "sector", "asset class",
        ],
        "patterns": [r"\d+\.\d+%", r"[A-Z]{2}\d{10}", r"[A-Z]{12}"],
        "extract": ["portfolio_date", "total_positions", "asset_classes"],
    },
}

CURRENCY_MAP = [
    ("$", "USD"), (_m2("€"), "EUR"), (_m2("£"), "GBP"),
    (_m2("¥"), "JPY"), ("CHF", "CHF"), ("Rs", "INR"), ("R$", "BRL"),
    ("C$", "CAD"), ("A$", "AUD"), ("HK$", "HKD"),
]

UNIT_PATTERNS = [
    r"million", r"billion", r"thousand", r"mn", r"bn", r"k",
    r"mg/ml", _MU + r"g/ml", r"ng/ml", r"mM", _MU + r"M", r"nM",
    r"kDa", r"Da", _DEG + r"C", _DEG + r"F", r"K",
    r"tCO2e?", r"MWh", r"GWh", r"GJ", r"TJ",
    r"%", r"percent", r"bps", r"basis points",
]

TICKER_RE = re.compile(r"\b[A-Z]{1,5}\b(?:\.[A-Z]{2})?")
TICKER_EXCLUDE = {"USD", "EUR", "GBP", "CEO", "CFO", "COO", "IPO",
                  "M&A", "Q1", "Q2", "Q3", "Q4"}

_QUARTER_RE = re.compile(r"(Q[1-4])\s*(\d{4}|\d{2})")
_FY_RE = re.compile(r"(FY|fiscal year)\s*(\d{4}|\d{2})", re.I)
_RANGE_RE = re.compile(
    r"(\d{1,2}/\d{1,2}/\d{2,4})\s*-\s*(\d{1,2}/\d{1,2}/\d{2,4})"
)
_PVAL_RE = re.compile(r"p\s*[<=]\s*0\.\d+")
_ERRBAR_RE = re.compile(_PM)
_CI_RE = re.compile(r"(CI|confidence\s*interval)", re.I)


def _joined(rows) -> str:
    return " ".join(str(c) for r in rows for c in r if c)


def detect_currency(rows) -> str | None:
    text = _joined(rows)
    for symbol, code in CURRENCY_MAP:
        if symbol in text:
            return code
    return None


def detect_units(rows) -> list[str]:
    text = _joined(rows)
    found = []
    for pat in UNIT_PATTERNS:
        if re.search(r"\b" + pat + r"\b", text, re.I):
            found.append(pat)
    return found


def detect_fiscal_period(rows) -> str | None:
    text = _joined(rows)
    for rx in (_QUARTER_RE, _FY_RE, _RANGE_RE):
        m = rx.search(text)
        if m:
            return m.group(0)
    return None


def detect_tickers(rows) -> list[str]:
    text = _joined(rows)
    out, seen = [], set()
    for t in TICKER_RE.findall(text):
        if t not in TICKER_EXCLUDE and t not in seen:
            seen.add(t)
            out.append(t)
            if len(out) == 10:
                break
    return out


def classify_table(rows: list[list[str]]) -> tuple[str, dict]:
    table_text = _joined(rows).lower()
    headers = (
        " ".join(str(c) for c in rows[0] if c).lower() if rows else ""
    )
    best_type, best_score = None, -1
    for ttype in CLASS_ORDER:
        cfg = CLASSIFICATIONS[ttype]
        score = 0
        for kw in cfg["keywords"]:
            if kw in table_text:
                score += 2
            if kw in headers:
                score += 3
        for pat in cfg["patterns"]:
            score += 2 * len(re.findall(pat, table_text))
        if score > best_score:
            best_type, best_score = ttype, score
    if best_score == 0:
        best_type = "general_data"
    return best_type, _type_metadata(rows, best_type)


def _type_metadata(rows, ttype) -> dict:
    cfg = CLASSIFICATIONS.get(ttype, {})
    extract = cfg.get("extract", [])
    md: dict = {"table_classification": ttype}
    if "currency" in extract:
        md["currency"] = detect_currency(rows)
    if "units" in extract:
        md["units"] = detect_units(rows)
    if "statistical_measures" in extract:
        text = str(rows)
        md["has_p_values"] = bool(_PVAL_RE.search(text))
        md["has_error_bars"] = bool(_ERRBAR_RE.search(text))
        md["has_confidence_intervals"] = bool(_CI_RE.search(text))
    if "fiscal_period" in extract:
        md["fiscal_period"] = detect_fiscal_period(rows)
    if "ticker_symbols" in extract:
        md["tickers"] = detect_tickers(rows)
    return md
