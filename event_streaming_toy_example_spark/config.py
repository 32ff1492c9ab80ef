"""Event taxonomy: types x subtypes x (field name -> generator tag).

This is *data*, not code: the same taxonomy the reference drives its
producer with (reference ``data_creation/event_config.yml``, realised by
the generator dispatch at ``producer.py:23-86``), restated as Python
constants for a seeded, column-expression-based Spark generator.

Reference quirks preserved on purpose (SURVEY.md §8.10-8.11):
- ``payment`` subtypes are literally ``order:completed`` /
  ``order:failed`` so ``event_name`` becomes
  ``payment:order:completed`` (triple colon) and the split-derived
  subtype is ``"order"``.
- 8 config-declared fields use generator tags with **no** generator
  branch (``account_field``, ``subscription_id``, ``subscription_type``,
  ``purchase_source``, ``reason_cancelled``, ``order_id``,
  ``payment_method``, ``game_id``); the reference silently omits them
  from events, so the realised schema has 30 ``event_specifics`` fields.
  They are listed here (taxonomy parity) and skipped by the generator
  (data parity).
- Both ``e-mail`` and ``email`` spellings exist.
- ``lesson.started`` has an unreachable nested ``resumed`` block in the
  reference YAML (indentation slip); it is NOT reproduced — the
  reachable taxonomy below is what the reference actually generates.
"""

from __future__ import annotations

#: Generator tags the reference's dispatch implements. Anything else is
#: silently omitted from generated data (SURVEY.md §8.10).
SUPPORTED_TAGS = frozenset(
    {
        "account_id",
        "session_id",
        "user_id",
        "exercise_id",
        "lesson_id",
        "currency",
        "device",
        "difficulty",
        "registration_method",
        "number",
        "number_1to10",
        "duration",
        "rating",
        "score",
        "amount",
        "timestamp",
        "language_id",
        "not_applicable",
        "email",
        "sentence",
        "location",
        "campaign_id",
    }
)

LANGUAGES = [
    "lang_de",
    "lang_it",
    "lang_es",
    "lang_fr",
    "lang_en",
    "lang_pl",
    "lang_pt",
    "lang_ru",
    "lang_tr",
    "lang_zh",
]
DEVICES = ["Android", "iOS", "web"]
DIFFICULTIES = ["Easy", "Medium", "Hard"]
REGISTRATION_METHODS = ["Google", "Microsoft", "Facebook", "Apple"]
CURRENCIES = ["USD", "EUR", "GBP", "JPY", "PLN", "TRY", "BRL", "RUB", "CNY", "CHF"]

_COMMON_ACCOUNT = {
    "language_id": "not_applicable",
    "device": "device",
    "account_id": "account_id",
    "session_id": "session_id",
    "user_location": "location",
}

#: type -> subtype -> {field name: generator tag}
EVENT_TAXONOMY: dict[str, dict[str, dict[str, str]]] = {
    "account": {
        "created": {**_COMMON_ACCOUNT, "registration_method": "registration_method"},
        "email_confirmed": {**_COMMON_ACCOUNT, "e-mail": "email"},
        "confirmation_bounced": {**_COMMON_ACCOUNT, "email": "email"},
        "updated": {**_COMMON_ACCOUNT, "updated_fields": "account_field"},
        "deleted": {**_COMMON_ACCOUNT, "days_active": "number"},
        "login": {**_COMMON_ACCOUNT, "last_login_time": "timestamp"},
        "logout": dict(_COMMON_ACCOUNT),
        "password-reset": dict(_COMMON_ACCOUNT),
    },
    "session": {
        "created": {
            "language_id": "language_id",
            "device": "device",
            "session_id": "session_id",
            "user_id": "user_id",
            "start_time": "timestamp",
            "user_location": "location",
        },
        "resumed": {
            "language_id": "language_id",
            "device": "device",
            "session_id": "session_id",
            "user_id": "user_id",
            "resume_time": "timestamp",
            "user_location": "location",
        },
        "ended": {
            "language_id": "language_id",
            "device": "device",
            "session_id": "session_id",
            "user_id": "user_id",
            "end_time": "timestamp",
            "user_location": "location",
        },
    },
    "language": {
        "selected": {
            "language_id": "not_applicable",
            "device": "device",
            "selected_language_id": "language_id",
            "session_id": "session_id",
            "user_location": "location",
        },
        "changed": {
            "language_id": "not_applicable",
            "device": "device",
            "selected_language_id": "language_id",
            "session_id": "session_id",
            "un_selected_language_id": "language_id",
            "user_location": "location",
        },
    },
    "lesson": {
        sub: {
            "language_id": "language_id",
            "device": "device",
            "lesson_id": "lesson_id",
            "user_id": "user_id",
            "duration": "duration",
            "session_id": "session_id",
            "user_location": "location",
        }
        for sub in ("started", "completed", "paused", "resumed", "skipped")
    },
    "exercise": {
        **{
            sub: {
                "language_id": "language_id",
                "device": "device",
                "exercise_id": "exercise_id",
                "user_id": "user_id",
                "duration": "duration",
                "score": "score",
                "session_id": "session_id",
                "user_location": "location",
            }
            for sub in ("attempted", "completed", "failed", "skipped")
        },
        "hint-requested": {
            "language_id": "language_id",
            "device": "device",
            "exercise_id": "exercise_id",
            "user_id": "user_id",
            "duration": "duration",
            "user_location": "location",
        },
    },
    "subscription": {
        "purchased": {
            "language_id": "not_applicable",
            "device": "device",
            "user_location": "location",
            "subscription_id": "subscription_id",
            "subscription_type": "subscription_type",
            "user_id": "user_id",
            "session_id": "session_id",
            "purchase_source": "purchase_source",
            "days_into_trial": "number",
        },
        "cancelled": {
            "language_id": "not_applicable",
            "device": "device",
            "user_location": "location",
            "subscription_id": "subscription_id",
            "subscription_type": "subscription_type",
            "user_id": "user_id",
            "session_id": "session_id",
            "reason_cancelled": "reason_cancelled",
            "days_active": "number",
        },
        "renewed": {
            "language_id": "not_applicable",
            "device": "device",
            "user_location": "location",
            "subscription_id": "subscription_id",
            "subscription_type": "subscription_type",
            "user_id": "user_id",
            "session_id": "session_id",
            "days_active": "number",
        },
    },
    "payment": {
        "order:completed": {
            "language_id": "not_applicable",
            "device": "device",
            "user_location": "location",
            "order_id": "order_id",
            "amount": "amount",
            "currency": "currency",
            "payment_method": "payment_method",
            "session_id": "session_id",
        },
        "order:failed": {
            "language_id": "not_applicable",
            "device": "device",
            "user_location": "location",
            "amount": "amount",
            "order_id": "order_id",
            "currency": "currency",
            "failcount": "number_1to10",
            "payment_method": "payment_method",
            "session_id": "session_id",
        },
    },
    "feedback": {
        "provided": {
            "language_id": "language_id",
            "device": "device",
            "user_location": "location",
            "exercise_id": "exercise_id",
            "feedback": "sentence",
            "user_id": "user_id",
            "session_id": "session_id",
        },
    },
    "rating": {
        "provided": {
            "language_id": "language_id",
            "device": "device",
            "user_location": "location",
            "exercise_id": "exercise_id",
            "rating": "rating",
            "user_id": "user_id",
            "session_id": "session_id",
        },
    },
    "game": {
        "started": {
            "device": "device",
            "user_location": "location",
            "game_id": "game_id",
            "language_id": "language_id",
            "difficulty": "difficulty",
            "score": "score",
            "session_id": "session_id",
        },
        "completed": {
            "device": "device",
            "user_location": "location",
            "game_id": "game_id",
            "duration": "duration",
            "attempts": "number",
            "language_id": "language_id",
            "difficulty": "difficulty",
            "score": "score",
            "session_id": "session_id",
        },
        "resumed": {
            "device": "device",
            "user_location": "location",
            "game_id": "game_id",
            "attempts": "number",
            "language_id": "language_id",
            "difficulty": "difficulty",
            "score": "score",
            "session_id": "session_id",
        },
    },
    "referral": {
        sub: {
            "language_id": "not_applicable",
            "device": "device",
            "user_location": "location",
            "referree_id": "user_id",
            "campaign_id": "campaign_id",
            "session_id": "session_id",
        }
        for sub in ("sent", "clicked", "accepted")
    },
}

EVENT_TYPES = list(EVENT_TAXONOMY)


def realized_fields(subtype_fields: dict[str, str]) -> dict[str, str]:
    """Drop fields whose generator tag has no implementation — the
    reference omits them from actual data (SURVEY.md §8.10)."""
    return {k: v for k, v in subtype_fields.items() if v in SUPPORTED_TAGS}


def realized_taxonomy() -> list[tuple[str, str, dict[str, str]]]:
    """Flat (event_type, event_subtype, realised fields) list, in a
    deterministic order. 36 entries."""
    out = []
    for etype, subs in EVENT_TAXONOMY.items():
        for sub, fields in subs.items():
            out.append((etype, sub, realized_fields(fields)))
    return out
