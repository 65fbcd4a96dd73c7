"""Pipeline assembly (medallion bronze→silver→gold) and plan inspection."""
