"""Deterministic synthetic shift-doc generator (S3 — SURVEY.md §2.1).

The reference serves 360 days of seeded-random nested shift docs
(reference api/app/generator.py:12-89, seed at api/app/__init__.py:1-4) with
these distributions, which we reproduce (fresh implementation, same shape):

  - one shift per day; start = day + 7:00-10:00 on a 15-min grid
  - length 8-12 h on a 15-min grid
  - a break with p=0.7, starting 2-3 h in, length ~ N(23 min, 5 min)
  - 0-3 allowances: value ∈ {0.5, 0.75, 1.0, 1.5}, cost ∈ [1.0, 50.0]
  - 0-3 award interpretations: units ∈ {0.5, 0.75, 1.0, 1.5},
    cost ∈ [1.0, 100.0]

Exact byte-parity with the reference's stream is NOT a goal (its values flow
through Python's global ``random``); determinism under our own seed is.
"""

from __future__ import annotations

import datetime as dt
import random
import uuid


def _uuid(rng: random.Random) -> str:
    return str(uuid.UUID(int=rng.getrandbits(128), version=4))


def generate_shift_docs(
    days: int = 360, seed: int = 42, start_date: dt.date = dt.date(2023, 1, 1)
) -> list[dict]:
    rng = random.Random(seed)
    docs: list[dict] = []
    for d in range(days):
        day = start_date + dt.timedelta(days=d)
        start = dt.datetime(day.year, day.month, day.day, tzinfo=dt.timezone.utc) + dt.timedelta(
            minutes=15 * rng.randint(7 * 4, 10 * 4)
        )
        finish = start + dt.timedelta(minutes=15 * rng.randint(8 * 4, 12 * 4))
        start_ms = int(start.timestamp() * 1000)
        finish_ms = int(finish.timestamp() * 1000)

        breaks = []
        if rng.random() < 0.7:
            b_start = start + dt.timedelta(minutes=rng.randint(120, 180))
            b_len = max(5.0, rng.gauss(23.0, 5.0))
            b_finish = b_start + dt.timedelta(minutes=b_len)
            breaks.append(
                {
                    "id": _uuid(rng),
                    "start": int(b_start.timestamp() * 1000),
                    "finish": int(b_finish.timestamp() * 1000),
                    "paid": rng.random() < 0.5,
                }
            )

        allowances = [
            {
                "id": _uuid(rng),
                "value": rng.choice([0.5, 0.75, 1.0, 1.5]),
                "cost": round(rng.uniform(1.0, 50.0), 4),
            }
            for _ in range(rng.randint(0, 3))
        ]
        awards = [
            {
                "id": _uuid(rng),
                "date": day.isoformat(),
                "units": rng.choice([0.5, 0.75, 1.0, 1.5]),
                "cost": round(rng.uniform(1.0, 100.0), 4),
            }
            for _ in range(rng.randint(0, 3))
        ]
        docs.append(
            {
                "id": _uuid(rng),
                "date": day.isoformat(),
                "start": start_ms,
                "finish": finish_ms,
                "breaks": breaks,
                "allowances": allowances,
                "award_interpretations": awards,
            }
        )
    return docs


def paginate(docs: list[dict], limit: int = 7, base: str = "/api/shifts") -> list[dict]:
    """Slice docs into reference-shaped page envelopes with prev/next links
    (reference api/app/main.py:78-113). limit is clamped to 1..30 like the
    API's validation (api/app/main.py:84-90)."""
    limit = max(1, min(30, limit))
    pages = []
    for start in range(0, len(docs), limit):
        chunk = docs[start : start + limit]
        links: dict = {"base": base}
        if start > 0:
            links["prev"] = f"{base}?start={max(0, start - limit)}&limit={limit}"
        if start + limit < len(docs):
            links["next"] = f"{base}?start={start + limit}&limit={limit}"
        pages.append(
            {
                "results": chunk,
                "links": links,
                "start": start,
                "limit": limit,
                "size": len(docs),
            }
        )
    return pages or [
        {"results": [], "links": {"base": base}, "start": 0, "limit": limit, "size": 0}
    ]
