"""Physical-plan utilities: partitioning, skew handling, plan inspection."""
