"""Expression-level building blocks (all Catalyst-side unless noted)."""
