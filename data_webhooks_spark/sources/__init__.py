"""Custom sources: derived-format fixtures (JSON/CSV) and the webhook
streaming DataSource."""
