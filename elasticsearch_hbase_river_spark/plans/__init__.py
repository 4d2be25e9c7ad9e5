"""End-to-end river pipeline plans (batch tick + flagship query)."""
