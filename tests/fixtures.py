"""Seeded reference-shaped fixture generators (FIXTURES.md schemas) with the
edge rows each operator branch needs: duplicate comment ids, HTML entities,
null closes, keyword titles, 260+ trading days per ticker."""

from __future__ import annotations

import datetime as dt
import random

TICKERS = [
    ("AAA", "Technology"),
    ("BBB", "Technology"),
    ("CCC", "Healthcare"),
    ("DDD", "Healthcare"),
    ("EEE", "Energy"),
]


def gen_stock_prices(n_days: int = 300, seed: int = 7) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    start = dt.date(2023, 1, 2)
    for ticker, sector in TICKERS:
        price = rng.uniform(50, 400)
        day = start
        n = 0
        while n < n_days:
            if day.weekday() < 5:  # trading days only
                drift = rng.uniform(-0.04, 0.042)
                o = price * (1 + rng.uniform(-0.01, 0.01))
                c = price * (1 + drift)
                hi = max(o, c) * (1 + rng.uniform(0, 0.01))
                lo = min(o, c) * (1 - rng.uniform(0, 0.01))
                # integer-valued doubles (prices in whole cents/100): exact in
                # IEEE754, so windowed sums are bit-identical across engines
                # regardless of sliding-accumulator strategy
                rows.append(
                    {
                        "id": f"{ticker}_{day.isoformat()}",
                        "ticker": ticker,
                        "sector": sector,
                        "date": day,
                        "open": float(round(o)),
                        "high": float(round(hi)),
                        "low": float(round(lo)),
                        # occasional null close (NaN-scrub path, stocks.py:149-169)
                        "close": None if rng.random() < 0.01 else float(round(c)),
                        "adj_close": float(round(c)),
                        "volume": rng.randint(1_000_000, 80_000_000),
                        "fetched_at": dt.datetime(2024, 6, 1, 5, 0, 0),
                    }
                )
                price = c
                n += 1
            day += dt.timedelta(days=1)
    return rows


_TITLES = [
    "Show HN: Python bindings for a fast database",
    "Rust is eating the world",
    "GPT-4 writes my tests now",
    "Why AI will not replace programmers",
    "A fair comparison of databases",
    "Pineapple on pizza considered harmful",
    "Ask HN: frustrated with my python setup",
    "The AI winter that never came",
    "Incremental view maintenance in databases",
    "Rustaceans and pythonistas unite",  # no \b matches for rust/python
]

_COMMENT_TEXTS = [
    "<p>This is <b>great</b> &amp; useful</p>",
    "plain comment with no markup",
    "",
    "short",
    "<a href='x'>link</a> only",
    "x" * 1200,  # truncation path
]


def gen_hn_stories(n: int = 400, seed: int = 11) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    start = dt.datetime(2023, 6, 5, 12, 0, 0)
    domains = ["example.com", "github.com", "arxiv.org", None, ""]
    for i in range(n):
        posted = start + dt.timedelta(hours=rng.randint(0, 24 * 200))
        week = (posted.date() - dt.timedelta(days=posted.weekday()))
        rows.append(
            {
                "id": 1000 + i,
                "title": rng.choice(_TITLES),
                "url": "https://example.com/x",
                "domain": rng.choice(domains),
                "author": f"user{rng.randint(1, 60)}",
                "score": rng.randint(1, 500),
                "descendants": rng.randint(0, 300),
                "posted_at": posted,
                "posted_week": week,
            }
        )
    return rows


def gen_hn_comments(n: int = 300, seed: int = 13) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    start = dt.datetime(2023, 6, 5, 12, 0, 0)
    for i in range(n):
        posted = start + dt.timedelta(hours=rng.randint(0, 24 * 100))
        cid = 5000 + i
        base = {
            "id": cid,
            "parent_id": 1000 + rng.randint(0, 399),
            "story_id": 1000 + rng.randint(0, 399),
            "author": f"user{rng.randint(1, 60)}",
            "text": rng.choice(_COMMENT_TEXTS),
            "posted_at": posted,
            "posted_month": posted.date().replace(day=1),
            "sentiment_score": None,
            "sentiment_label": None,
            "sentiment_category": None,
            "posted_day": posted.date(),
        }
        rows.append(base)
        if rng.random() < 0.15:  # duplicate id from a later "sync batch" (W1 dedup path)
            dup = dict(base)
            dup["posted_at"] = posted + dt.timedelta(hours=2)
            dup["text"] = base["text"] + " edited"
            rows.append(dup)
    return rows


_REACTION_STRINGS = [
    "DIARRHOEA, VOMITING, NAUSEA",
    "RASH",
    "HIVES, ITCHING",
    "HEADACHE, DIZZINESS",
    "CHEST PAIN, PALPITATIONS",
    "COUGH, DIFFICULTY BREATHING",
    "FATIGUE, WEAKNESS",
    "FEVER, CHILLS",
    "ABDOMINAL PAIN, CRAMPS",
    "MALAISE",          # -> Other... (no category term)
    "OVARIAN CANCER",   # -> Other
    None,
]

_OUTCOMES = ["Hospitalization", "Visited Emergency Room", "Death", "Other Outcome", None]
_GENDERS = ["F", "Female", "M", "Male", "", None, "Unknown"]
_INDUSTRIES = ["Bakery Prod/Dough/Mix/Icing", "Vit/Min/Prot/Unconv Diet(Human/Animal)", "Soft Drink/Water"]


def gen_fda_events(n: int = 250, seed: int = 17) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        report = f"R{2000 + i}"
        created = dt.date(2018 + rng.randint(0, 5), rng.randint(1, 12), rng.randint(1, 28))
        base = {
            "report_number": report,
            "reactions": rng.choice(_REACTION_STRINGS),
            "outcomes": rng.choice(_OUTCOMES),
            "products_brand_name": f"Brand{rng.randint(1, 40)}",
            "products_industry_code": str(rng.randint(1, 60)),
            "products_role": "Suspect",
            "products_industry_name": rng.choice(_INDUSTRIES),
            "date_created": created,
            "date_started": None if rng.random() < 0.3 else created - dt.timedelta(days=rng.randint(0, 60)),
            "consumer_gender": rng.choice(_GENDERS),
            "consumer_age": round(rng.uniform(1, 90), 1),
            "consumer_age_unit": "year(s)",
        }
        rows.append(base)
        if rng.random() < 0.3:  # multi-product duplicate (Suspect-preferred dedup path)
            dup = dict(base)
            dup["products_role"] = "Concomitant"
            dup["products_brand_name"] = f"Brand{rng.randint(41, 80)}"
            rows.append(dup)
    return rows


_RECALL_REASONS = [
    "Product may be contaminated with Listeria monocytogenes",
    "Possible Salmonella contamination",
    "Presence of E. coli O157:H7",
    "Undeclared milk allergen",
    "Product contains peanut not listed on label",
    "Potential foreign material (metal fragments)",
    "Mislabeled: incorrect label applied",
    "Temperature abuse during storage",
    "Product past expiration",  # -> Other
]

_STATES_US = ["CA", "NY", "TX", "IA", "WA"]


def gen_fda_recalls(n: int = 200, seed: int = 19) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        is_nan = rng.random() < 0.05
        rows.append(
            {
                "recall_number": "nan" if is_nan else f"F-{3000 + i}",
                "event_id": 90000 + i,
                "classification": rng.choice(["Class I", "Class II", "Class III"]),
                "status": rng.choice(["Ongoing", "Terminated", "Completed"]),
                "voluntary_mandated": "Voluntary: Firm initiated",
                "recalling_firm": f"Firm {rng.randint(1, 50)}",
                "city": "Des Moines",
                "state": rng.choice(_STATES_US + ["ON", "XX"]),
                "country": rng.choice(["United States"] * 4 + ["Canada"]),
                "postal_code": "50309",
                "reason_for_recall": rng.choice(_RECALL_REASONS),
                "product_description": "Ready-to-eat product",
                "product_quantity": "1000 cases",
                "distribution_pattern": "Nationwide",
                "recall_initiation_date": dt.date(2019 + rng.randint(0, 4), rng.randint(1, 12), rng.randint(1, 28)),
                "center_classification_date": None,
                "report_date": None,
                "termination_date": None,
            }
        )
    return rows
