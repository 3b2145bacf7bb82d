package graft.queries

/** DuckDB oracle for `ontology_materialize_useraccounts`: replays the 33
  * email-bearing provider arms (the three enrich-only mappings emit no
  * canonical key and so contribute nothing), resolves winners by
  * (module priority, src id) exactly like [[graft.ontology.Materialize]],
  * and counts HAS_SOURCE links per canonical email. Strategy columns are
  * pre-evaluated per the reference templates: equal_boolean = membership
  * in the values list, invert_boolean = NOT(coalesce(parse, false)) (a
  * null flag reads ACTIVE), to_boolean = parse-else-IS-NOT-NULL, and
  * nor_boolean = NOT(OR of null-coalesced members). */
private[queries] object UserAccountsOracle {
  val sql: String =
    """WITH src AS (
      |  SELECT CASE WHEN c_custkey % 9 = 0 THEN NULL
      |           ELSE 'u' || CAST(c_custkey % 700 AS VARCHAR) || '@corp.ex' END AS email,
      |         c_name AS fullname, c_custkey % 3 = 0 AS active,
      |         CAST(NULL AS BOOLEAN) AS has_mfa,
      |         0 AS prio, 'ms' || CAST(c_custkey AS VARCHAR) AS sid,
      |         'EntraUser' AS lbl FROM customer
      |  UNION ALL
      |  SELECT 'u' || CAST(s_suppkey % 700 AS VARCHAR) || '@corp.ex', s_name,
      |         CASE WHEN s_suppkey % 5 = 0 THEN true ELSE s_suppkey % 2 = 1 END,
      |         s_suppkey % 4 <> 0,
      |         10, 'lp' || CAST(s_suppkey AS VARCHAR), 'LastpassUser' FROM supplier
      |  UNION ALL
      |  SELECT 'u' || CAST(n_nationkey AS VARCHAR) || '@corp.ex', n_name,
      |         NOT ((n_nationkey % 7 <> 0 AND n_nationkey % 2 = 0)
      |              OR ((n_nationkey + 1) % 6 <> 0 AND (n_nationkey + 1) % 2 = 0)),
      |         NULL,
      |         20, 'gs' || CAST(n_nationkey AS VARCHAR), 'GSuiteUser' FROM nation
      |  UNION ALL
      |  SELECT 'u' || CAST(r_regionkey AS VARCHAR) || '@corp.ex',
      |         'anth ' || r_name, NULL, NULL,
      |         30, 'an' || CAST(r_regionkey AS VARCHAR), 'AnthropicUser' FROM region
      |  UNION ALL
      |  SELECT 'u' || CAST(r_regionkey + 5 AS VARCHAR) || '@corp.ex',
      |         'ab ' || r_name, NULL, NULL,
      |         40, 'ab' || CAST(r_regionkey AS VARCHAR), 'AirbyteUser' FROM region
      |  UNION ALL
      |  SELECT 'u' || CAST(n_nationkey AS VARCHAR) || '@corp.ex', NULL,
      |         n_nationkey % 3 = 0, n_nationkey % 2 = 1,
      |         50, 'cf' || CAST(n_nationkey AS VARCHAR), 'CloudflareMember' FROM nation
      |  UNION ALL
      |  SELECT 'u' || CAST(n_nationkey + 10 AS VARCHAR) || '@corp.ex', n_name,
      |         n_nationkey % 4 IN (0, 1), NULL,
      |         60, 'duo' || CAST(n_nationkey AS VARCHAR), 'DuoUser' FROM nation
      |  UNION ALL
      |  SELECT 'u' || CAST(s_suppkey % 300 AS VARCHAR) || '@corp.ex',
      |         'gh ' || s_name, NULL, s_suppkey % 2 = 0,
      |         70, 'gh' || CAST(s_suppkey AS VARCHAR), 'GitHubUser' FROM supplier
      |  UNION ALL
      |  SELECT 'u' || CAST(n_nationkey AS VARCHAR) || '@corp.ex',
      |         'gl ' || n_name, n_nationkey % 3 = 0, NULL,
      |         80, 'gl' || CAST(n_nationkey AS VARCHAR), 'GitLabUser' FROM nation
      |  UNION ALL
      |  SELECT 'u' || CAST(r_regionkey AS VARCHAR) || '@corp.ex', NULL,
      |         r_regionkey % 2 = 0, r_regionkey % 3 = 0,
      |         90, 'kc' || CAST(r_regionkey AS VARCHAR), 'KeycloakUser' FROM region
      |  UNION ALL
      |  SELECT 'u' || CAST((c_custkey + 350) % 700 AS VARCHAR) || '@corp.ex',
      |         c_name, c_custkey % 5 <> 0, NULL,
      |         100, 'sf' || CAST(c_custkey AS VARCHAR), 'SalesforceUser' FROM customer
      |  UNION ALL
      |  SELECT 'u' || CAST(n_nationkey + 3 AS VARCHAR) || '@corp.ex',
      |         'oci ' || n_name, n_nationkey % 3 = 0, n_nationkey % 4 = 0,
      |         110, 'oci' || CAST(n_nationkey AS VARCHAR), 'OCIUser' FROM nation
      |  UNION ALL
      |  SELECT 'u' || CAST(r_regionkey + 2 AS VARCHAR) || '@corp.ex',
      |         'oa ' || r_name, NULL, NULL,
      |         120, 'oa' || CAST(r_regionkey AS VARCHAR), 'OpenAIUser' FROM region
      |  UNION ALL
      |  SELECT 'u' || CAST(n_nationkey + 6 AS VARCHAR) || '@corp.ex', NULL,
      |         CASE WHEN n_nationkey % 3 = 0 THEN true ELSE n_nationkey % 2 = 1 END,
      |         n_nationkey % 2 = 1,
      |         130, 'sw' || CAST(n_nationkey AS VARCHAR), 'ScalewayUser' FROM nation
      |  UNION ALL
      |  SELECT 'u' || CAST(r_regionkey + 1 AS VARCHAR) || '@corp.ex', NULL, NULL, NULL,
      |         140, 'si' || CAST(r_regionkey AS VARCHAR), 'SnipeitUser' FROM region
      |  UNION ALL
      |  SELECT 'u' || CAST(n_nationkey + 4 AS VARCHAR) || '@corp.ex',
      |         'ts ' || n_name, n_nationkey % 4 IN (0, 1), NULL,
      |         150, 'ts' || CAST(n_nationkey AS VARCHAR), 'TailscaleUser' FROM nation
      |  UNION ALL
      |  SELECT 'u' || CAST(r_regionkey + 3 AS VARCHAR) || '@corp.ex', NULL, NULL, NULL,
      |         160, 'ok' || CAST(r_regionkey AS VARCHAR), 'OktaUser' FROM region
      |  UNION ALL
      |  SELECT 'u' || CAST(r_regionkey AS VARCHAR) || '@corp.ex',
      |         'gw ' || r_name,
      |         NOT ((r_regionkey % 4 <> 0 AND r_regionkey % 2 = 0)
      |              OR ((r_regionkey + 1) % 3 <> 0 AND (r_regionkey + 1) % 2 = 0)),
      |         NULL,
      |         180, 'gw' || CAST(r_regionkey AS VARCHAR), 'GoogleWorkspaceUser' FROM region
      |  UNION ALL
      |  SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL
      |           ELSE 'u' || CAST(n_nationkey + 8 AS VARCHAR) || '@corp.ex' END,
      |         'sl ' || n_name, NULL, n_nationkey % 2 = 0,
      |         190, 'sl' || CAST(n_nationkey AS VARCHAR), 'SlackUser' FROM nation
      |  UNION ALL
      |  SELECT 'u' || CAST(r_regionkey + 7 AS VARCHAR) || '@corp.ex',
      |         'sp ' || r_name, NULL, NULL,
      |         200, 'sp' || CAST(r_regionkey AS VARCHAR), 'SpaceliftUser' FROM region
      |  UNION ALL
      |  SELECT 'u' || CAST(r_regionkey + 9 AS VARCHAR) || '@corp.ex',
      |         'pd ' || r_name, NULL, NULL,
      |         210, 'pd' || CAST(r_regionkey AS VARCHAR), 'PagerDutyUser' FROM region
      |  UNION ALL
      |  SELECT 'u' || CAST(n_nationkey + 11 AS VARCHAR) || '@corp.ex', NULL, NULL, NULL,
      |         220, 'wo' || CAST(n_nationkey AS VARCHAR), 'WorkOSUser' FROM nation
      |  UNION ALL
      |  SELECT 'u' || CAST(r_regionkey + 11 AS VARCHAR) || '@corp.ex', NULL,
      |         r_regionkey % 2 = 0, NULL,
      |         221, 'wod' || CAST(r_regionkey AS VARCHAR), 'WorkOSDirectoryUser' FROM region
      |  UNION ALL
      |  SELECT 'u' || CAST(n_nationkey + 12 AS VARCHAR) || '@corp.ex',
      |         'sn ' || n_name,
      |         CASE WHEN n_nationkey % 6 = 0 THEN true ELSE n_nationkey % 2 = 1 END,
      |         n_nationkey % 3 = 1,
      |         230, 'sn' || CAST(n_nationkey AS VARCHAR), 'SentryUser' FROM nation
      |  UNION ALL
      |  SELECT 'u' || CAST(r_regionkey + 13 AS VARCHAR) || '@corp.ex', NULL, NULL, NULL,
      |         240, 'sub' || CAST(r_regionkey AS VARCHAR), 'SubImageTeamMember' FROM region
      |  UNION ALL
      |  SELECT 'u' || CAST(n_nationkey + 14 AS VARCHAR) || '@corp.ex', NULL,
      |         CASE WHEN n_nationkey % 8 = 0 THEN true ELSE n_nationkey % 2 = 1 END,
      |         n_nationkey % 2 = 0,
      |         260, 'jc' || CAST(n_nationkey AS VARCHAR), 'JumpCloudUser' FROM nation
      |  UNION ALL
      |  SELECT 'u' || CAST(r_regionkey + 15 AS VARCHAR) || '@corp.ex',
      |         'vc ' || r_name, r_regionkey % 2 = 1, NULL,
      |         270, 'vc' || CAST(r_regionkey AS VARCHAR), 'VercelUser' FROM region
      |  UNION ALL
      |  SELECT 'u' || CAST(n_nationkey + 16 AS VARCHAR) || '@corp.ex',
      |         'rw ' || n_name, NULL, n_nationkey % 3 = 2,
      |         280, 'rw' || CAST(n_nationkey AS VARCHAR), 'RailwayUser' FROM nation
      |  UNION ALL
      |  SELECT 'u' || CAST(r_regionkey + 17 AS VARCHAR) || '@corp.ex',
      |         'nl ' || r_name, NULL, r_regionkey % 2 = 0,
      |         290, 'nl' || CAST(r_regionkey AS VARCHAR), 'NetlifyUser' FROM region
      |  UNION ALL
      |  SELECT 'u' || CAST(n_nationkey + 18 AS VARCHAR) || '@corp.ex',
      |         'db ' || n_name, n_nationkey % 4 <> 0, NULL,
      |         300, 'db' || CAST(n_nationkey AS VARCHAR), 'DatabricksUser' FROM nation
      |  UNION ALL
      |  SELECT 'u' || CAST(r_regionkey + 18 AS VARCHAR) || '@corp.ex',
      |         'dba ' || r_name, r_regionkey % 2 = 0, NULL,
      |         301, 'dba' || CAST(r_regionkey AS VARCHAR), 'DatabricksAccountUser' FROM region
      |  UNION ALL
      |  SELECT 'u' || CAST(n_nationkey + 19 AS VARCHAR) || '@corp.ex', NULL, NULL,
      |         CASE WHEN n_nationkey % 5 = 4 THEN false
      |              WHEN n_nationkey % 3 = 0 THEN true
      |              WHEN n_nationkey % 3 = 1 THEN false
      |              ELSE true END,
      |         310, 'su' || CAST(n_nationkey AS VARCHAR), 'SupabaseOrganizationMember' FROM nation
      |  UNION ALL
      |  SELECT 'u' || CAST(r_regionkey + 20 AS VARCHAR) || '@corp.ex',
      |         'mo ' || r_name, NULL, NULL,
      |         320, 'mo' || CAST(r_regionkey AS VARCHAR), 'ModalUser' FROM region),
      |winners AS MATERIALIZED (
      |  SELECT email, fullname, active, has_mfa, lbl FROM (
      |    SELECT *, row_number() OVER (PARTITION BY email ORDER BY prio, sid) AS rk
      |    FROM src WHERE email IS NOT NULL) WHERE rk = 1),
      |links AS (SELECT s.email, count(*) AS n FROM src s
      |          JOIN winners w ON s.email = w.email GROUP BY s.email)
      |SELECT w.email, w.fullname, w.active, w.has_mfa, w.lbl AS _ont_source,
      |  CAST(l.n AS BIGINT) AS n_sources
      |FROM winners w JOIN links l ON w.email = l.email""".stripMargin
}
