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
