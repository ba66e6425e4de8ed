"""Classification lexicon — keyword/pattern data (KERNEL_SPEC.md §4.4).

Data, not code: the keyword lists, regex patterns, currency map, unit
patterns and exclusion sets that define the reference's 9-way
classification (/root/reference/enterprise_table_extractor_full.py:
97-153, :212-245, :276-280). The reference's double-mojibake literals
(quirk #3) are generated, not pasted, by two utf-8→cp1252 rounds.
tests/test_engine_kernel.py asserts this module equals refkernel's
independently maintained copy.
"""

from __future__ import annotations


def mojibake2(s: str) -> str:
    for _ in range(2):
        s = s.encode("utf-8").decode("cp1252")
    return s


_PM = mojibake2("±")
_DEG = mojibake2("°")
_MU = mojibake2("μ")

CLASS_ORDER = (
    "financial_income", "financial_balance", "financial_cashflow",
    "financial_ratios", "scientific_data", "clinical_trial",
    "market_data", "esg_metrics", "portfolio_holdings",
)

KEYWORDS = {
    "financial_income": (
        "revenue", "income", "expense", "profit", "loss", "earnings",
        "ebitda", "margin", "sales", "cost", "operating", "net income",
        "gross profit"),
    "financial_balance": (
        "assets", "liabilities", "equity", "debt", "capital", "cash",
        "receivables", "payables", "inventory", "goodwill"),
    "financial_cashflow": (
        "cash flow", "operating", "investing", "financing",
        "free cash flow", "capex", "working capital", "dividends"),
    "financial_ratios": (
        "ratio", "margin", "roe", "roa", "roi", "eps", "p/e",
        "debt/equity", "current ratio", "quick ratio", "leverage"),
    "scientific_data": (
        "experiment", "sample", "control", "mean", "std", "p-value",
        "significant", "correlation", "n=", "error", "ci", "confidence"),
    "clinical_trial": (
        "patient", "placebo", "treatment", "adverse", "efficacy",
        "safety", "endpoint", "phase", "randomized", "double-blind"),
    "market_data": (
        "price", "volume", "market cap", "shares", "trading", "close",
        "open", "high", "low", "bid", "ask", "yield"),
    "esg_metrics": (
        "carbon", "emissions", "scope", "renewable", "diversity",
        "governance", "sustainability", "ghg", "co2", "environmental"),
    "portfolio_holdings": (
        "holdings", "position", "weight", "allocation", "security",
        "cusip", "isin", "sector", "asset class"),
}

PATTERNS = {
    "financial_income": (r"\$[\d,]+", r"million", r"billion", r"thousand",
                         r"mn", r"bn"),
    "financial_balance": (r"\$[\d,]+", r"balance sheet",
                          r"statement of financial position"),
    "financial_cashflow": (r"cash", r"flow", r"fcf"),
    "financial_ratios": (r"\d+\.\d+x", r"\d+%", r"times", r"percent"),
    "scientific_data": (
        _PM, r"p\s*[<=]\s*0\.\d+",
        r"\d+\.\d+\s*" + _PM + r"\s*\d+\.\d+",
        r"r\s*=\s*[0-9.-]+", r"n\s*=\s*\d+"),
    "clinical_trial": (r"phase\s+[IVX123]", r"n\s*=\s*\d+",
                       r"%\s*\([^)]+\)"),
    "market_data": (r"\$\d+\.\d{2}", r"\d+[KMB]", r"\d{1,3}(,\d{3})*"),
    "esg_metrics": (r"tco2e?", r"mwh", r"gj", r"scope\s*[123]"),
    "portfolio_holdings": (r"\d+\.\d+%", r"[A-Z]{2}\d{10}", r"[A-Z]{12}"),
}

EXTRACTORS = {
    "financial_income": ("currency", "fiscal_period", "units",
                         "company_identifiers"),
    "financial_balance": ("currency", "date", "units",
                          "accounting_standard"),
    "financial_cashflow": ("currency", "period", "units",
                           "cash_flow_type"),
    "financial_ratios": ("ratio_types", "comparison_period", "benchmarks"),
    "scientific_data": ("units", "statistical_measures", "sample_size",
                        "p_values"),
    "clinical_trial": ("trial_phase", "patient_count", "endpoints",
                       "drug_name"),
    "market_data": ("ticker_symbols", "date_range", "exchange", "currency"),
    "esg_metrics": ("metric_type", "reporting_standard", "time_period"),
    "portfolio_holdings": ("portfolio_date", "total_positions",
                           "asset_classes"),
}

CURRENCY_MAP = (
    ("$", "USD"), (mojibake2("€"), "EUR"), (mojibake2("£"), "GBP"),
    (mojibake2("¥"), "JPY"), ("CHF", "CHF"), ("Rs", "INR"), ("R$", "BRL"),
    ("C$", "CAD"), ("A$", "AUD"), ("HK$", "HKD"),
)

UNIT_PATTERNS = (
    r"million", r"billion", r"thousand", r"mn", r"bn", r"k",
    r"mg/ml", _MU + r"g/ml", r"ng/ml", r"mM", _MU + r"M", r"nM",
    r"kDa", r"Da", _DEG + r"C", _DEG + r"F", r"K",
    r"tCO2e?", r"MWh", r"GWh", r"GJ", r"TJ",
    r"%", r"percent", r"bps", r"basis points",
)

TICKER_EXCLUDE = frozenset(
    {"USD", "EUR", "GBP", "CEO", "CFO", "COO", "IPO", "M&A",
     "Q1", "Q2", "Q3", "Q4"})

BOILER_TAGS = frozenset({"nav", "footer", "header", "aside"})
BOILER_CLASS_TOKENS = ("nav", "menu", "footer", "sidebar", "cookie",
                       "banner")
