"""Row-level security analog for the engine's bookkeeping tables (P4).

The reference enables RLS on cdc_webhook.credentials and
cdc_webhook.event_log and installs all-or-nothing policies:
`USING (pg_has_role(CURRENT_USER, 'postgres', 'MEMBER'))`
(cdc_webhook--1.0.sql:54-69) — members of the required role see every
row, everyone else sees none (queries still run; rows are silently
hidden).

Spark has no session user that enforces row policies inside the engine,
so the same semantics are modeled explicitly: a `RolePolicy` carries
the role-membership relation, `apply()` is the USING clause (identity
for members, empty relation otherwise — Catalyst folds the
`filter(False)` into an empty scan, so the gated plan costs nothing for
non-members), and the store-level accessors (`CredentialStore.view_for`,
`EventQueue.state_for`) add the engine's sanctioned non-member
fallback: the masked/redacted display form instead of silence, so
operators without the role can still see that subscriptions exist
without ever seeing secret material (ST10).
"""

from __future__ import annotations

from collections.abc import Mapping
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RolePolicy:
    """The CREATE POLICY ... USING (pg_has_role(...)) analog."""

    required_role: str = "postgres"
    membership: Mapping[str, frozenset] = field(default_factory=dict)

    def has_role(self, principal: str) -> bool:
        """pg_has_role(principal, required_role, 'MEMBER')."""
        return self.required_role in self.membership.get(principal, frozenset())

    def apply(self, df: DataFrame, principal: str) -> DataFrame:
        """The USING clause: all rows for members, none otherwise."""
        if self.has_role(principal):
            return df
        return df.filter(F.lit(False))


def grant(policy: RolePolicy, principal: str) -> RolePolicy:
    """GRANT role TO principal — returns a new policy (policies are
    immutable values, like the DDL they model)."""
    membership = {k: frozenset(v) for k, v in policy.membership.items()}
    membership[principal] = membership.get(principal, frozenset()) | {
        policy.required_role
    }
    return RolePolicy(policy.required_role, membership)
