"""Canonical 2-shift golden fixture — the exact payload the reference's own
test suite uses (reference etl/tests/test_shift_data_processor.py:52-115;
documented in FIXTURES.md §3). Expected flattened counts 2/2/3/2 and the six
2-dp KPI values below come from the same file (:320-392)."""

SHIFT_A = {
    "id": "b2b9437a-28df-4ec4-8e4a-2bbdc241330b",
    "date": "2023-11-27",
    "start": 1701077400000,
    "finish": 1701108900000,
    "breaks": [
        {
            "id": "16419f82-8b9d-4434-a465-e150bd9c66b3",
            "start": 1701085620000,
            "finish": 1701087005277,
            "paid": False,
        }
    ],
    "allowances": [
        {"id": "815ef6d1-3b8f-4a18-b7f8-a88b17fc695a", "value": 0.5, "cost": 2.5},
        {"id": "b38a088c-a65e-4389-b74d-0fb132e70629", "value": 0.5, "cost": 29.7},
        {"id": "cf36d58b-4737-4190-96da-1dac72ff5d2a", "value": 1.5, "cost": 12.2},
    ],
    "award_interpretations": [],
}

SHIFT_B = {
    "id": "d453dd32-4b0d-4b41-8d52-88f1142c3fe8",
    "date": "2023-11-28",
    "start": 1701160200000,
    "finish": 1701198000000,
    "breaks": [
        {
            "id": "6142ea7d-17be-4111-9a2a-73ed562b0f79",
            "start": 1701168180000,
            "finish": 1701169724388,
            "paid": True,
        }
    ],
    "allowances": [],
    "award_interpretations": [
        {
            "id": "bacfb3d0-0b1f-4163-8e9f-f57f43b7a3a6",
            "date": "2023-11-28",
            "units": 1.0,
            "cost": 62.8,
        },
        {
            "id": "60e7a113-ec1b-4ca1-b91e-1d4c1ff49b78",
            "date": "2023-11-28",
            "units": 1.5,
            "cost": 55.9,
        },
    ],
}

GOLDEN_DOCS = [SHIFT_A, SHIFT_B]

# anchor "current date" far (>14 days) after 2023-11-28, as in the reference
ANCHOR_DATE = "2024-01-15"

GOLDEN_KPIS = {
    "mean_break_length_in_minutes": 24.41,
    "mean_shift_cost": 81.55,
    "max_allowance_cost_14d": 0.00,
    "max_break_free_shift_period_in_days": 0.00,
    "min_shift_length_in_hours": 8.75,
    "total_number_of_paid_breaks": 1.00,
}
