"""Operator library: SURVEY §2's inventory as composable DataFrame fns."""
