"""Custom functions for the engine (SURVEY.md §2.9): cron expansion and
validation UDFs. Everything else the engine needs is a Spark built-in."""
