"""Source connectors (SURVEY §2.1 S1-S6).

Each API source is a paginated driver-side fetch (pagination state —
batch tokens, page counts, OAuth refresh — is inherently sequential
and stays on the driver) that lands payloads into an executor-side
DataFrame with an explicit payload schema. The fetcher is injectable
so tests run against fixtures and production wires real HTTP clients.
"""
