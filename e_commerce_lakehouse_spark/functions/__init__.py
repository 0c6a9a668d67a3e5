from .money import cents, money_from_cents, revenue_cents  # noqa: F401
