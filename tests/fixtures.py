"""Seeded reference-shaped fixture generators (FIXTURES.md schemas) with the
edge rows each operator branch needs: duplicate comment ids, HTML entities,
null closes, keyword titles, 260+ trading days per ticker.

Scaling: every generator's default volume multiplies by
``$SPARK_GRAFT_FIXTURE_SCALE`` (default 1) — facts scale (more days, more
rows, key ranges widen together so FK references stay valid), dims
(users, cycles, tickers, stores) stay fixed, the realistic growth shape.
At scale 1 the output is BIT-IDENTICAL to the unscaled generators (same
rng call sequence), so pinned tests are unaffected; at scale N the same
parity suites become the at-scale model evidence (tools/dag_scale.py)."""

from __future__ import annotations

import datetime as dt
import os
import random


def fixture_scale() -> int:
    return max(1, int(os.environ.get("SPARK_GRAFT_FIXTURE_SCALE", "1")))

TICKERS = [
    ("AAA", "Technology"),
    ("BBB", "Technology"),
    ("CCC", "Healthcare"),
    ("DDD", "Healthcare"),
    ("EEE", "Energy"),
]


def gen_stock_prices(n_days: int | None = None, seed: int = 7) -> list[dict]:
    n_days = 300 * fixture_scale() if n_days is None else n_days
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
                # Mean-revert outside [5, 5000] so the walk stays where the
                # whole-cent invariant below actually holds at EVERY fixture
                # scale: the drift's positive mean otherwise compounds to
                # ~1e14 over 100x more days, where the engines' round(x, 4)
                # implementations differ below the comparison's 6 sig figs
                # (Spark rounds via BigDecimal, DuckDB in double arithmetic).
                # Consumes no RNG draws and never binds at scale 1 (range
                # 78-357), so scale-1 fixtures are byte-identical.
                if price > 5000:
                    drift = -abs(drift)
                elif price < 5:
                    drift = abs(drift)
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
    "python is wonderful for this",
    "I rewrote it in <b>rust</b> last week",
    "the AI hype is exhausting",
    "GPT-4 surprised me here",
    "our databases kept falling over",
]


def gen_hn_stories(n: int | None = None, seed: int = 11) -> list[dict]:
    n = 400 * fixture_scale() if n is None else n
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


def gen_hn_comments(n: int | None = None, seed: int = 13, n_stories: int | None = None) -> list[dict]:
    n = 300 * fixture_scale() if n is None else n
    n_stories = 400 * fixture_scale() if n_stories is None else n_stories
    rng = random.Random(seed)
    rows = []
    start = dt.datetime(2023, 6, 5, 12, 0, 0)
    for i in range(n):
        posted = start + dt.timedelta(hours=rng.randint(0, 24 * 100))
        cid = 5000 + i
        base = {
            "id": cid,
            "parent_id": 1000 + rng.randint(0, n_stories - 1),
            "story_id": 1000 + rng.randint(0, n_stories - 1),
            "author": f"user{rng.randint(1, 60)}",
            "text": rng.choice(_COMMENT_TEXTS),
            "posted_at": posted,
            "posted_month": posted.date().replace(day=1),
            # exact binary fractions (k/8) → cross-engine-exact aggregates;
            # ~25% unscored (the reference's null-sentiment rows)
            "sentiment_score": None if rng.random() < 0.25 else rng.randint(-8, 8) / 8,
            "sentiment_label": None,
            "sentiment_category": None,
            "posted_day": posted.date(),
        }
        s = base["sentiment_score"]
        if s is not None:
            base["sentiment_label"] = "POSITIVE" if s >= 0 else "NEGATIVE"
            base["sentiment_category"] = (
                "positive" if s > 0.25 else "negative" if s < -0.25 else "neutral"
            )
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


def gen_fda_events(n: int | None = None, seed: int = 17) -> list[dict]:
    n = 250 * fixture_scale() if n is None else n
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
    "Potential Clostridium botulinum growth",
    "Undeclared milk allergen",
    "Product contains undeclared peanuts",
    "Undeclared egg not listed on the label",
    "Undeclared wheat and soy ingredients",
    "Undeclared almond pieces",
    "Undeclared shrimp in the seasoning mix",
    "Undeclared sesame seeds",
    "Potential foreign material (metal fragments)",
    "Mislabeled: incorrect label applied",
    "Temperature abuse during storage",
    "Product past expiration",  # -> Other
]

_STATES_US = ["CA", "NY", "TX", "IA", "WA"]


def gen_fda_recalls(n: int | None = None, seed: int = 19) -> list[dict]:
    n = 200 * fixture_scale() if n is None else n
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


def gen_linear_github(seed: int = 23):
    """Linear users/issues/cycles + GitHub users/PRs/reviews/comments with
    overlapping emails (case-varied), parent issues, self-reviews, and PRs
    without reviews. Facts (issues/prs/reviews/comments) scale; user and
    cycle dims stay fixed."""
    sc = fixture_scale()
    n_issues, n_prs, n_reviews, n_comments = 120 * sc, 60 * sc, 150 * sc, 200 * sc
    rng = random.Random(seed)
    linear_users = [
        {"id": f"lu{i}", "email": None if i % 7 == 0 else f"User{i}@Example.com",
         "display_name": f"L User {i}" if i % 3 else None, "name": f"luser{i}", "active": True}
        for i in range(20)
    ]
    github_users = [
        {"id": f"gu{i}", "email": None if i % 5 == 0 else f"user{i}@example.com",
         "login": f"gh{i}", "name": f"G User {i}", "avatar_url": "https://x"}
        for i in range(8, 28)  # overlap ids 8..19 with linear
    ]
    cycles = [
        {"id": f"cy{i}", "number": i, "name": f"Cycle {i}",
         "starts_at": dt.datetime(2024, 1, 1) + dt.timedelta(days=14 * i),
         "ends_at": dt.datetime(2024, 1, 15) + dt.timedelta(days=14 * i),
         "team_name": "ENG"}
        for i in range(6)
    ]
    issues = []
    for i in range(n_issues):
        parent = (
            f"li{rng.randint(0, n_issues // 3 - 1)}"
            if i >= n_issues // 3 and rng.random() < 0.25
            else None
        )
        issues.append(
            {"id": f"li{i}", "identifier": f"ENG-{i}", "title": f"Issue {i}",
             "state": rng.choice(["Backlog", "In Progress", "Done"]),
             "assignee_id": None if rng.random() < 0.2 else f"lu{rng.randint(0, 19)}",
             "priority": rng.randint(0, 4), "estimate": rng.choice([None, 1.0, 2.0, 3.0, 5.0]),
             "created_at": dt.datetime(2024, 1, 1) + dt.timedelta(hours=rng.randint(0, 2000)),
             "updated_at": dt.datetime(2024, 4, 1), "project_name": "Core",
             "labels": ["SDLC:NewStuff"] if rng.random() < 0.5 else [],
             "cycle_id": None if rng.random() < 0.3 else f"cy{rng.randint(0, 5)}",
             "parent_id": parent, "parent_identifier": None}
        )
    prs = [
        {"id": f"pr{i}", "number": i, "repo": rng.choice(["app", "infra"]),
         "title": f"PR {i}", "state": rng.choice(["open", "closed"]),
         "merged": rng.random() < 0.6, "draft": rng.random() < 0.1,
         "author_id": f"gu{rng.randint(8, 27)}",
         "created_at": dt.datetime(2024, 2, 1) + dt.timedelta(hours=rng.randint(0, 1000)),
         "updated_at": dt.datetime(2024, 4, 1), "merged_at": None, "closed_at": None,
         "ready_for_review_at": None if rng.random() < 0.4
             else dt.datetime(2024, 2, 1) + dt.timedelta(hours=rng.randint(0, 1000)),
         "additions": rng.randint(0, 500), "deletions": rng.randint(0, 300),
         "changed_files": rng.randint(1, 30)}
        for i in range(n_prs)
    ]
    reviews = []
    comments = []
    for i in range(n_reviews):
        pr = prs[rng.randint(0, n_prs - 1)]
        author = pr["author_id"] if rng.random() < 0.1 else f"gu{rng.randint(8, 27)}"  # some self
        reviews.append(
            {"id": f"rv{i}", "pull_request_id": pr["id"], "repo": pr["repo"],
             "author_id": author,
             "state": rng.choice(["APPROVED", "CHANGES_REQUESTED", "COMMENTED"]),
             "submitted_at": pr["created_at"] + dt.timedelta(hours=rng.randint(1, 200)),
             "body": "lgtm"}
        )
    for i in range(n_comments):
        pr = prs[rng.randint(0, n_prs - 1)]
        comments.append(
            {"id": f"cm{i}", "pull_request_id": pr["id"], "repo": pr["repo"],
             "author_id": f"gu{rng.randint(8, 27)}",
             "created_at": pr["created_at"] + dt.timedelta(hours=rng.randint(1, 300)),
             "updated_at": None, "path": None, "body": "comment"}
        )
    return linear_users, github_users, cycles, issues, prs, reviews, comments


def gen_oura(seed: int = 29, n_days: int | None = None):
    n_days = 120 * fixture_scale() if n_days is None else n_days
    rng = random.Random(seed)
    start = dt.date(2024, 1, 1)
    sleep, readiness, activity, sessions = [], [], [], []
    for i in range(n_days):
        day = start + dt.timedelta(days=i)
        if rng.random() < 0.9:
            sleep.append({"id": f"sl{i}", "day": day, "score": rng.randint(40, 100),
                          **{f"contributor_{c}": rng.randint(40, 100) for c in
                             ("deep_sleep", "efficiency", "latency", "rem_sleep",
                              "restfulness", "timing", "total_sleep")}})
        if rng.random() < 0.85:
            readiness.append({"id": f"rd{i}", "day": day, "score": rng.randint(40, 100),
                              "temperature_deviation": round(rng.uniform(-1.5, 1.5), 2),
                              **{f"contributor_{c}": rng.randint(40, 100) for c in
                                 ("activity_balance", "body_temperature", "hrv_balance",
                                  "previous_day_activity", "previous_night", "recovery_index",
                                  "resting_heart_rate", "sleep_balance")}})
        n_act = rng.choice([0, 1, 1, 2])  # duplicate-day rows for dedup path
        for j in range(n_act):
            activity.append({"id": f"ac{i}_{j}", "day": day, "score": rng.randint(40, 100),
                             "active_calories": rng.randint(100, 900),
                             "total_calories": rng.randint(1800, 3200),
                             "steps": rng.randint(1000, 20000),
                             "equivalent_walking_distance": rng.randint(1000, 15000),
                             "high_activity_time": rng.randint(0, 3600),
                             "medium_activity_time": rng.randint(0, 7200),
                             "low_activity_time": rng.randint(0, 20000),
                             "sedentary_time": rng.randint(10000, 40000),
                             "resting_time": rng.randint(20000, 40000),
                             **{f"contributor_{c}": rng.randint(40, 100) for c in
                                ("meet_daily_targets", "move_every_hour", "recovery_time",
                                 "stay_active", "training_frequency", "training_volume")}})
        for j, stype in enumerate(["long_sleep"] + (["nap"] if rng.random() < 0.3 else [])):
            if rng.random() < 0.95:
                sessions.append({"id": f"ss{i}_{j}", "day": day,
                                 "bedtime_start": dt.datetime.combine(day, dt.time(23, 0)),
                                 "bedtime_end": dt.datetime.combine(day + dt.timedelta(days=1), dt.time(7, 0)),
                                 "sleep_type": stype,
                                 "total_sleep_duration_seconds": rng.randint(1800, 30000),
                                 "time_in_bed_seconds": rng.randint(20000, 34000),
                                 "awake_time_seconds": rng.randint(600, 4000),
                                 "light_sleep_duration_seconds": rng.randint(8000, 18000),
                                 "deep_sleep_duration_seconds": rng.randint(2000, 8000),
                                 "rem_sleep_duration_seconds": rng.randint(2000, 8000),
                                 "latency_seconds": rng.randint(60, 1800),
                                 "efficiency": rng.randint(60, 99),
                                 "average_heart_rate": float(rng.randint(48, 70)),
                                 "lowest_heart_rate": rng.randint(40, 60),
                                 "average_hrv": rng.randint(20, 90),
                                 "restless_periods": rng.randint(0, 40),
                                 "average_breath": float(rng.randint(12, 18))})
    return sleep, readiness, activity, sessions


def gen_trends(n_days: int | None = None, seed: int = 31) -> list[dict]:
    """Contiguous daily interest series per keyword (lag-7/30 + centered
    peak support)."""
    n_days = 200 * fixture_scale() if n_days is None else n_days
    rng = random.Random(seed)
    rows = []
    start = dt.date(2024, 1, 1)
    for kw in ["python", "rust", "duckdb"]:
        level = rng.randint(20, 60)
        for i in range(n_days):
            level = max(0, min(100, level + rng.randint(-8, 8)))
            day = start + dt.timedelta(days=i)
            rows.append(
                {"id": f"{kw}_{day.isoformat()}_US", "keyword": kw, "date": day,
                 "interest": level, "is_partial": False, "geo": "US",
                 "fetched_at": dt.datetime(2024, 8, 1, 5, 0, 0)}
            )
    return rows


_COUNTIES = ["POLK", "LINN", "SCOTT", None]
_CATEGORIES = ["WHISKEY", "VODKA", "RUM", "TEQUILA"]
_VENDORS = ["Acme Spirits", "Prairie Distribution", "Hawkeye Beverages"]
_ITEMS = ["Old Oak 750ml", "Crystal Clear 1L", "Island Gold 750ml", "Agave Sun 375ml"]


def gen_iowa_sales(n: int | None = None, seed: int = 37) -> list[dict]:
    n = 600 * fixture_scale() if n is None else n
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        day = dt.date(2023, 1, 1) + dt.timedelta(days=rng.randint(0, 540))
        bottles = rng.randint(1, 48)
        cost = round(rng.uniform(4, 30), 2)
        rows.append(
            {"invoice_and_item_number": f"INV-{100000 + i}",
             "date": day,
             "store_number": str(rng.randint(2000, 2020)),
             "store_name": "Store", "address": "123 Main", "city": "Des Moines",
             "zip_code": "50309", "county": rng.choice(_COUNTIES),
             "category": str(rng.randint(101, 104)),
             "category_name": rng.choice(_CATEGORIES),
             "vendor_number": str(rng.randint(10, 12)),
             "vendor_name": rng.choice(_VENDORS),
             "item_number": str(rng.randint(500, 503)),
             "item_description": rng.choice(_ITEMS),
             "pack": 12, "bottle_volume_ml": 750, "bottles_sold": bottles,
             "state_bottle_cost": cost,
             "state_bottle_retail": round(cost * 1.5, 2),
             "sale_dollars": round(cost * 1.5 * bottles, 2),
             "volume_sold_liters": round(bottles * 0.75, 2),
             "volume_sold_gallons": round(bottles * 0.198, 2),
             "sale_month": day.replace(day=1),
             "sale_year": day.year}
        )
    return rows


# ---------------------------------------------------------------------------
# Natural-language corpus fixture (r4 verdict item #6): public-domain prose
# in the four marker languages plus crawl-style junk rows, shaped like the
# documents table, so the text operators are validated on text that behaves
# like the 100 TB target domain — not just the synthetic TPC-H word salad.
# Sources: Melville, Moby-Dick (1851); Austen, Pride and Prejudice (1813);
# Kafka, Die Verwandlung (1915); Hugo, Les Misérables (1862); Cervantes,
# Don Quijote (1605) — all public domain. PII strings are synthetic.
# doc_ids deliberately avoid multiples of 7/11/13 so text_pii_scan's
# deterministic injection branches stay OFF and the counts below come from
# the fixture text alone.
# ---------------------------------------------------------------------------
NATURAL_DOCS = [
    (1, "en", "gutenberg",
     "Call me Ishmael. Some years ago, never mind how long precisely, "
     "having little or no money in my purse, and nothing particular to "
     "interest me on shore, I thought I would sail about a little and see "
     "the watery part of the world. It is a way I have of driving off the "
     "spleen and regulating the circulation."),
    (2, "en", "gutenberg",
     "It is a truth universally acknowledged, that a single man in "
     "possession of a good fortune, must be in want of a wife. However "
     "little known the feelings or views of such a man may be on his first "
     "entering a neighbourhood, this truth is so well fixed in the minds "
     "of the surrounding families, that he is considered the rightful "
     "property of some one or other of their daughters."),
    (3, "de", "gutenberg",
     "Als Gregor Samsa eines Morgens aus unruhigen Traeumen erwachte, fand "
     "er sich in seinem Bett zu einem ungeheueren Ungeziefer verwandelt. "
     "Er lag auf seinem panzerartig harten Ruecken und sah, wenn er den "
     "Kopf ein wenig hob, seinen gewoelbten, braunen, von bogenfoermigen "
     "Versteifungen geteilten Bauch, auf dessen Hoehe sich die Bettdecke, "
     "zum gaenzlichen Niedergleiten bereit, kaum noch erhalten konnte. Die "
     "Decke war das einzige, was ihm blieb, und das Zimmer ist still."),
    (4, "fr", "gutenberg",
     "Le pere Madeleine etait devenu riche, et les habitants de la petite "
     "ville parlaient de lui avec respect. La fortune est venue lentement, "
     "et le travail des ouvriers etait honore dans les ateliers. Il est "
     "arrive un soir, et la ville entiere parlait encore de ce voyageur "
     "qui marchait seul sur la route, et les enfants le suivaient."),
    (5, "es", "gutenberg",
     "En un lugar de la Mancha, de cuyo nombre no quiero acordarme, no ha "
     "mucho tiempo que vivia un hidalgo de los de lanza en astillero, "
     "adarga antigua, rocin flaco y galgo corredor. El resto della "
     "concluian sayo de velarte, calzas de velludo para las fiestas, con "
     "sus pantuflos de lo mesmo, y los dias de entresemana se honraba con "
     "su vellori de lo mas fino. Es el hidalgo mas famoso de la comarca."),
    (6, "en", "crawl",
     "Thank you for visiting the support page of our store. You can reach "
     "the billing team at alice@example.com or the returns desk at "
     "bob123@mail.org for a refund of the order. For urgent issues call "
     "555-0199 during business hours, and the status host at 192.168.1.10 "
     "shows the queue of open tickets for the whole team."),
    (8, "en", "crawl",
     " ".join(["buy now"] * 30)),
    (9, "en", "crawl",
     "hello world"),
]


def write_natural_docs(spark, out_dir: str) -> str:
    """Write the corpus as a documents-shaped parquet dir; returns a path
    usable as a catalog sf_dir (only the documents table exists)."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(i, t, lg, src) for i, lg, src, t in NATURAL_DOCS],
        "doc_id long, text string, lang string, source string",
    ).withColumn("n_chars", F.length("text").cast("long"))
    df.select("doc_id", "text", "lang", "source", "n_chars").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/documents.parquet")
    return out_dir
