"""Test-support code shared between pytest and evidence scripts."""
