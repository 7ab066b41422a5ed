"""Structured Streaming extension (SURVEY §2.9 / §7.6).

The reference has no streaming; its README's 'Quittin Time' use case
— continuously monitor sales and forecast the next 30 minutes — is
built here natively: ``readStream`` → event-time watermark → sliding
windows → per-key incremental forecast.
"""
